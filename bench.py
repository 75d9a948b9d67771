"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized via a pruning-proof hash-reduce: xxhash64 over
every output column, summed. A plain count() lets Catalyst prune the
projection itself, so a narrow map query (e.g. q19's feature expressions)
would measure only the scan; hashing every column forces the full
computed output while still shipping just one row to the driver — mirrors
how a 100 TB run would sink all columns to storage.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from example_dms_dataexport_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational / pipeline core
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q05_forecast_revenue",
    "q10_top_orders_per_customer",
    "q11_latest_event_per_user",
    "q17_load_plan",
    "q18_cdc_merge",
    # LLM-training-data operators
    "q19_text_features",
    "q22_exact_dedup",
    "q24_minhash_dedup_pairs",
    "q28_knn_brute",
    "q34_sessionize",
    "q38_cleaning_pipeline",
    "q39_asof_attribution",
    "q43_dedup_clusters",
    "q47_line_dedup",
    "q48_unigram_logprob",
    "q49_incremental_rollup",
    "q52_tfidf_top_terms",
    "q53_range_join_windows",
    "q62_funnel_stages",
    "q64_resample_ffill",
    "q65_trailing_hour_avg",
    "q76_snapshot_diff",
    "q80_bloom_semi_join",
    "q83_bm25_rank",
    "q84_quality_percentile",
]


def materialize(df) -> None:
    """Force full computation of every output column (defeats count()'s
    column pruning) while returning a single row to the driver."""
    from pyspark.sql import functions as F

    # decimal(38,0) sum: a long sum of 64-bit hashes overflows under ANSI
    df.select(F.xxhash64(*df.columns).cast("decimal(38,0)").alias("_h")).agg(
        F.sum("_h")
    ).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    from example_dms_dataexport_spark.registry import load_all

    QUERIES, _ = load_all()

    names = [n for n in HEADLINE if n in QUERIES]
    # Warm the JVM + file-listing caches once with the cheapest query so
    # per-query numbers measure the plan, not session cold-start.
    materialize(QUERIES[names[0]](spark, sf_dir))

    times: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt

    # Streaming CDC end-to-end at bench scale: q18's change-set served as
    # CSV files through the file source + foreachBatch merge
    # (Trigger.AvailableNow, multiple micro-batches).
    import shutil
    import tempfile

    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_cdc_stream_fixture,
    )

    td = tempfile.mkdtemp(prefix="bench-cdc-")
    try:
        t0 = time.perf_counter()
        run_cdc_stream_fixture(spark, sf_dir, td)
        dt = time.perf_counter() - t0
        times["cdc_stream_e2e"] = round(dt, 3)
        total += dt
    finally:
        shutil.rmtree(td, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
