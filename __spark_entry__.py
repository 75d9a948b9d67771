"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the end-to-end corpus cleaning pipeline (quality →
    language → exact dedup → MinHash near-dup removal) at sf0.001."""
    from example_dms_dataexport_spark.registry import load_all

    queries, _ = load_all()
    return queries["q38_cleaning_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from example_dms_dataexport_spark.registry import load_all

    return dict(load_all()[0])


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (None entries omitted →
    driver records a weaker rows-only check for those)."""
    from example_dms_dataexport_spark.registry import load_all

    return {k: v for k, v in load_all()[1].items() if v is not None}
