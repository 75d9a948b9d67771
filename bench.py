"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized via a count over the full query (no collect of
payload rows to the driver — mirrors how a 100 TB run would sink to
storage rather than the driver).
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
]


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
    QUERIES[names[0]](spark, sf_dir).count()

    times: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt
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
