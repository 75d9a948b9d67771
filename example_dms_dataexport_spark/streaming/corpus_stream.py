"""Continuous corpus ingestion — the streaming twin of the spec-driven
``operators.corpus_pipeline`` runner.

A training corpus that ingests documents continuously cannot re-run the
batch pipeline over the full corpus per sync; the at-scale shape is:
apply the PER-DOCUMENT cleaning stages to each micro-batch, reconcile
against the corpus for exactly-once + cross-batch content dedup, and
land the survivors with an O(batch) file append (the same
``append_files`` primitive the ANN ingest stream rides — a per-batch
table rewrite is exactly what a stream cannot afford).

Stage admission: only stages whose semantics are per-document given a
FROZEN side input compose into a stream — ``quality``, ``quality_lang``,
``model_quality`` (frozen classifier), ``model_lang`` (frozen model),
``repetition``, ``decontam`` (frozen reference), ``sample``
(hash-deterministic). Corpus-relative stages refuse loudly at START:
``exact_dedup`` is REPLACED by the stream's own cross-batch
content-hash reconciliation (running it per batch would silently
narrow its scope to the batch), ``near_dedup`` needs the corpus-wide
signature store (compose ``operators.dedup.incremental_neardup``
downstream), ``perplexity`` WITHOUT a frozen ``lm`` trains from its input
(batch-local LM ≠ the batch pipeline's corpus LM — pass
``train_unigram_lm(ref)`` to stream it), and ``chunk``/``pack`` change the
row grain (they belong in the export pipeline over the corpus table).

Exactly-once: each appended row carries a ``_fp`` content fingerprint
COLUMN, so reconciliation is two columnar anti-joins (id, fingerprint)
against the corpus table — no text re-hash of the corpus per batch. A
replayed batch (foreachBatch retry, lost checkpoint, or the
append-files crashed-prefix window) drops already-landed ids and
already-seen content; first arrival wins across batches (stream
order), min-id wins within a batch — the same tie rules as
``dedup_doc_stream`` / ``exact_dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions import texthash as TH
from ..operators.corpus_pipeline import run_corpus_pipeline, validate_spec

FP_COL = "_fp"

# stages whose per-batch application equals their batch-pipeline
# semantics (per-document, given frozen side inputs)
STREAMABLE_STAGES = {
    "quality",
    "quality_lang",
    "model_quality",
    "model_lang",
    "repetition",
    "decontam",
    "sample",
}


def corpus_ingest_schema(
    id_col: str = "doc_id", text_col: str = "text"
) -> StructType:
    """Default landing-file schema: (id bigint, text string)."""
    return StructType(
        [StructField(id_col, LongType()), StructField(text_col, StringType())]
    )


def start_corpus_ingest_stream(
    spark: SparkSession,
    landing_glob: str,
    warehouse,
    table: str,
    spec: list[dict],
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: StructType | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    compact_every: int | None = 20,
) -> StreamingQuery:
    """Feed parquet document landing files through the per-document
    cleaning ``spec`` into the corpus ``table``, one reconciled
    O(batch) append per micro-batch. The first batch CREATES the table
    (with the ``_fp`` fingerprint column); later batches append.
    """
    validate_spec(spec)
    bad = [
        st["op"]
        for st in spec
        if st["op"] not in STREAMABLE_STAGES
        # perplexity streams ONLY with a frozen LM: without one it
        # trains its model from the batch, which silently diverges
        # from the batch pipeline's corpus LM
        and not (st["op"] == "perplexity" and "lm" in st)
    ]
    if bad:
        raise ValueError(
            f"stage(s) {bad} are corpus-relative and cannot stream "
            f"per-batch (streamable: {sorted(STREAMABLE_STAGES)}); "
            "exact dedup is built into the stream's reconciliation, "
            "near-dup composes downstream via incremental_neardup, "
            "chunk/pack belong in the export pipeline"
        )

    import os

    stream = (
        spark.readStream.schema(schema or corpus_ingest_schema(id_col, text_col))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_glob)
    )

    def ingest_batch(batch: DataFrame, batch_id: int) -> None:
        kept = run_corpus_pipeline(
            spark, batch, spec, id_col=id_col, text_col=text_col
        )
        # within-batch exact dedup (min-id per content hash — the
        # batch-pipeline tie rule), then the fingerprint column the
        # corpus reconciliation joins on
        row = F.struct(*[F.col(c) for c in kept.columns])
        kept = (
            kept.withColumn("_chash", F.md5(F.col(text_col)))
            .groupBy("_chash")
            .agg(F.min_by(row, F.col(id_col)).alias("_keep"))
            .select("_keep.*")
            .withColumn(FP_COL, TH.fingerprint(F.col(text_col)))
        )
        if not os.path.isdir(warehouse.path(table)):
            warehouse.overwrite(kept, table)
            return
        corpus = warehouse.read(spark, table)
        fresh = kept.join(
            corpus.select(id_col), id_col, "left_anti"
        ).join(corpus.select(FP_COL), FP_COL, "left_anti")
        warehouse.append_files(
            spark, fresh.select(*corpus.columns), table
        )
        if (
            compact_every is not None
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            try:
                warehouse.compact(spark, table)
            except Exception:  # noqa: BLE001 — maintenance never fails a batch
                pass

    writer = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
