"""The local oracle gate must see the driver's Arrow-layer type drift.

Round-10 lesson: DuckDB ``fetchall()`` converts HUGEINT to a plain
Python int, so ``SUM(BIGINT)`` oracles pass the local exact compare
while the driver's hash layer receives decimal128(38,0) and red-rows
the query (q133).  ``fragile_oracle_types`` probes the bound result
schema via ``DESCRIBE`` so that class fails locally too.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from check_oracle import fragile_oracle_types  # noqa: E402


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT, p DOUBLE)")
    return con


def test_sum_bigint_flagged_as_hugeint():
    # the exact pre-fix q133 shape: inner casts only, no outer cast
    bad = "SELECT SUM(CAST(a AS BIGINT) + CAST(b AS BIGINT)) AS s FROM t"
    flagged = fragile_oracle_types(_con(), bad)
    assert flagged == [("s", "HUGEINT")]


def test_outer_cast_clears_the_flag():
    good = "SELECT CAST(SUM(a + b) AS BIGINT) AS s FROM t"
    assert fragile_oracle_types(_con(), good) == []


def test_decimal_output_flagged():
    bad = "SELECT CAST(p AS DECIMAL(12,2)) AS d FROM t"
    flagged = fragile_oracle_types(_con(), bad)
    assert flagged and "DECIMAL" in flagged[0][1]


def test_cte_queries_are_probed():
    bad = "WITH x AS (SELECT a FROM t) SELECT SUM(a) AS s FROM x"
    assert fragile_oracle_types(_con(), bad) == [("s", "HUGEINT")]


def test_double_and_bigint_outputs_pass():
    good = "SELECT CAST(count(*) AS BIGINT) AS n, avg(p) AS m FROM t"
    assert fragile_oracle_types(_con(), good) == []


def test_all_registered_oracles_are_hugeint_free():
    """Sweep every registered oracle's bound schema — no query may ship
    a HUGEINT/DECIMAL driver-facing column again."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from example_dms_dataexport_spark.tables import TABLE_NAMES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        flagged = fragile_oracle_types(con, sql)
        if flagged:
            bad[name] = flagged
    assert not bad, f"fragile oracle output types: {bad}"


def test_freshness_red_rows_are_not_coverage(tmp_path):
    """A red driver row (the q133 shape) must not count as freshness
    coverage: the query has to re-enter the window until a green row
    lands."""
    import json

    sys.path.insert(0, "/root/repo/tools")
    from check_freshness import latest_driver_rows

    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps(
            {
                "q_green": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                },
            }
        )
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps(
            {
                "q_green": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                },
                "q_red": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": False,
                },
                "q_err": {"rows_match": False, "err": "boom"},
            }
        )
    )
    latest, newest = latest_driver_rows(str(tmp_path))
    assert newest == 10
    assert latest["q_green"] == 10
    assert latest["q_red"] == 0  # known, but no green row yet
    assert latest["q_err"] == 0
