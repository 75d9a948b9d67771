"""Time individual registered faces (or bench OVERRIDE bodies) in one
session: ``python tools/bench_one.py q148_dsir_importance_weights [more...]``.

Same methodology as bench.py (hash-reduce materialize, median of
SPARK_GRAFT_BENCH_RUNS runs, interleaved mini-calibration) so numbers
are comparable to BENCH_LOCAL artifacts on the same host. A/B helper
only — never writes artifacts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from example_dms_dataexport_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_one.py <face> [face...]")
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from example_dms_dataexport_spark.registry import load_all

    QUERIES, _ = load_all()

    def mini_calibrate() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 25_000_000, 1, 32)
            .select(F.xxhash64("id").cast("decimal(38,0)").alias("h"))
            .agg(F.sum("h"))
            .collect()
        )
        return time.perf_counter() - t0

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # warm JVM + listing caches + the calibration stanza
    materialize(QUERIES[names[0]](spark, sf_dir))
    mini_calibrate()

    for name in names:
        fn = QUERIES[name]
        runs, cals = [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
            cals.append(mini_calibrate())
        runs.sort()
        cals.sort()
        med = runs[len(runs) // 2]
        print(
            f"{name}: median {med:.3f}s  min {runs[0]:.3f}s  "
            f"cal {cals[len(cals) // 2]:.3f}s  runs {[round(r, 3) for r in runs]}"
        )


if __name__ == "__main__":
    main()
