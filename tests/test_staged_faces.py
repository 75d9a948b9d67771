"""registry.STAGED faces: written this round, held out of the driver
window until an r18 rotation slot opens (tools/check_oracle.py --staged
is the exact local gate; this suite keeps them green in CI meanwhile)."""

from __future__ import annotations

import math

import duckdb
import pytest

from example_dms_dataexport_spark.registry import STAGED, load_all
from example_dms_dataexport_spark.tables import TABLE_NAMES

# STAGED populates as a side effect of importing the query modules —
# load_all() at collection time so the parametrize below sees them
load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_staged_names_do_not_collide_with_registered():
    qs, _ = load_all()
    assert not set(STAGED) & set(qs)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_face_matches_its_oracle(spark, con, name):
    fn, oracle = STAGED[name]
    sdf = fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(r[c]) for c in scols) for r in sdf.collect()
    )
    assert oracle is not None, f"{name} staged without an oracle"
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    assert sorted(dcols) == scols
    drows = sorted(
        tuple(_norm(row[dcols.index(c)]) for c in scols)
        for row in res.fetchall()
    )
    assert srows == drows
