"""Binary (1-bit) signature tier (simsearch.binary_signature /
knn_hamming)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import simsearch as SS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def means(emb):
    return SS.dim_means(emb)


@pytest.fixture(scope="module")
def sigs(emb, means):
    return SS.binary_signatures(emb, means).cache()


def _np_sig(v, means):
    s = 0
    for i in range(64):
        if v[i] > means[i]:
            s |= 1 << i
    # Java long wraps bit 63 to the sign
    return s - (1 << 64) if s >= (1 << 63) else s


def test_signature_bits_match_numpy(emb, means, sigs):
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    got = {r["vec_id"]: r["sig"] for r in sigs.collect()}
    assert len(got) == len(vecs)
    for vid, v in list(vecs.items())[:100]:
        assert got[vid] == _np_sig(v, means)


def test_means_center_the_bits(sigs, emb):
    """Centered signatures use every bit: each of the 64 bit positions
    is set for some vectors and clear for others (a raw-sign encoding
    of non-centered data would have constant bits carrying nothing)."""
    rows = [r["sig"] & ((1 << 64) - 1) for r in sigs.collect()]
    n = len(rows)
    for i in range(64):
        ones = sum((s >> i) & 1 for s in rows)
        assert 0 < ones < n, f"bit {i} is constant"


def test_hamming_matches_numpy_popcount(sigs, emb):
    probes = sigs.filter(F.col("vec_id") % 101 == 0)
    out = SS.knn_hamming(sigs, probes, k=5).collect()
    assert out
    by_id = {r["vec_id"]: r["sig"] & ((1 << 64) - 1) for r in sigs.collect()}
    for r in out:
        want = bin(by_id[r["probe_id"]] ^ by_id[r["vec_id"]]).count("1")
        assert r["hamming"] == want


def test_rank_contract_and_shortlist_recall(emb, means, sigs):
    """Hamming pre-ranking is a useful shortlist generator: the top-40
    Hamming shortlist recovers most of the exact cosine top-10."""
    probes = sigs.filter(F.col("vec_id") % 101 == 0)
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in SS.knn_brute(
            emb, emb.filter(F.col("vec_id") % 101 == 0), k=10
        ).collect()
    }
    short = {
        (r["probe_id"], r["vec_id"])
        for r in SS.knn_hamming(sigs, probes, k=40).collect()
    }
    recall = len(exact & short) / len(exact)
    assert recall >= 0.5, f"hamming shortlist recall collapsed: {recall}"


def test_plan_is_pure_jvm(sigs, spark):
    probes = sigs.limit(3)
    plan = (
        SS.knn_hamming(sigs, probes, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan


def test_zero_norm_vectors_are_excluded(spark, means):
    """Same admission rule as the other similarity tiers: a zero-norm
    vector has no direction — its centering-means-only signature must
    not enter Hamming shortlists that exact-cosine rerank NULLs out."""
    rows = [(1, [0.0] * 64), (2, [0.0] * 63 + [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in SS.binary_signatures(df, means).collect()}
    assert got == {2}
