"""Shared query/oracle registry.

Query modules register via the ``query`` decorator; ``load_all()`` imports
every query module and returns the populated maps. The driver contract
(``__spark_entry__``) and local tools consume only this entry point.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str | None] = {}


def query(name: str, oracle: str | None):
    """Register a (spark, sf_dir) -> DataFrame callable with its DuckDB
    oracle SQL (None = driver records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


def load_all():
    from . import queries_llm, queries_relational  # noqa: F401

    return QUERIES, ORACLES
