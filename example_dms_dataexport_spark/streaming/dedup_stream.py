"""Streaming exact dedup — the continuous-ingest twin of
``operators.dedup.exact_dedup``.

A training-data pipeline that ingests documents continuously can't run
batch dedup over the full corpus per sync; Structured Streaming's
``dropDuplicatesWithinWatermark`` keeps a state-store entry per content
fingerprint and drops later arrivals, with the event-time watermark
bounding state: a fingerprint older than the watermark is evicted, so
state size is O(docs per watermark window), not O(corpus).

The dedup key is the same ``functions.texthash.fingerprint`` used by the
batch operator (head-hash ⊕ length ⊕ tail-hash, JVM expressions), so a
document kept by the stream is exactly a document the batch path would
keep — first arrival wins in stream order, where batch ties are broken by
min doc_id.  Cross-restart the state store persists in the checkpoint, so
a restarted stream still rejects duplicates of already-admitted documents
within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH


def dedup_doc_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop streamed documents whose content fingerprint was already seen
    within the watermark horizon (first arrival wins)."""
    return (
        docs.withColumn("_fp", TH.fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
