"""Dump ``explain("formatted")`` per query into plans/r<N>/ files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` (e.g. plans/r19/q157_lang_model_id_before.txt)
for each named query (default: every registered query). Plans only — the
queries are built, never executed. Bench-only sentinel bodies are
resolvable through their ``*_bench_*`` names in the query modules.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from example_dms_dataexport_spark.plans import physical_plan  # noqa: E402
from example_dms_dataexport_spark.registry import load_all  # noqa: E402
from example_dms_dataexport_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.001"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs, _ = load_all()
    names = rest or list(qs)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            # bench-only sentinel bodies: module.func path
            import importlib

            for mod in (
                "example_dms_dataexport_spark.queries_llm",
                "example_dms_dataexport_spark.queries_relational",
            ):
                m = importlib.import_module(mod)
                if hasattr(m, name):
                    fn = getattr(m, name)
                    break
        if fn is None:
            print(f"skip {name}: unknown")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = physical_plan(df)
        except Exception as e:  # noqa: BLE001 - report, don't die
            plan = f"ERROR building plan: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
