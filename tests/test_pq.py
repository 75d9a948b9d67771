"""Product-quantization ANN (operators/pq.py) contracts.

Fixture: the driver-generated embeddings table at sf0.001 (64-dim
float vectors) — real distributional shape, small enough to brute-force
an exact reference in-process.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import pq
from example_dms_dataexport_spark.operators.simsearch import knn_brute

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def book(emb):
    return pq.pq_train(emb, m=8, k=64, iters=8)


@pytest.fixture(scope="module")
def codes(emb, book):
    return pq.pq_encode(emb, book).cache()


def test_train_shapes_and_inertia_monotone(book):
    assert book["m"] == 8 and book["k"] == 64 and book["sub"] == 8
    cent = np.asarray(book["centroids"])
    assert cent.shape == (8, 64, 8)
    assert np.isfinite(cent).all()
    inertia = book["inertia"]
    assert len(inertia) == 8
    # Lloyd's is non-increasing in quantization error (tiny float slack
    # for the mean's re-association between iterations)
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a * (1 + 1e-9)


def test_train_deterministic(emb, book):
    again = pq.pq_train(emb, m=8, k=64, iters=8)
    assert json.dumps(again["centroids"]) == json.dumps(book["centroids"])
    assert again["inertia"] == book["inertia"]


def test_train_refuses_bad_geometry(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, m=7)


def test_encode_matches_independent_argmin(emb, codes, book):
    """Spark-side codes equal an independently computed nearest-centroid
    assignment (full |x-c|^2, not the udf's shifted form) on a slice."""
    rows = (
        codes.join(emb, "vec_id")
        .filter(F.col("vec_id") % 37 == 0)
        .select("vec_id", "code", "vnorm", "embedding")
        .collect()
    )
    assert rows
    cent = np.asarray(book["centroids"])
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64).reshape(8, 8)
        d2 = ((x[:, None, :] - cent) ** 2).sum(-1)  # (m, k)
        expect = d2.argmin(-1)
        assert list(r["code"]) == list(expect)
        assert r["vnorm"] == pytest.approx(
            float(np.sqrt((x**2).sum())), rel=1e-9
        )


def test_encode_pure_function(emb, codes, book):
    """Same codebook, different input partitioning -> identical codes
    (encoding depends on nothing but (vector, codebook))."""
    first = {
        r["vec_id"]: (tuple(r["code"]), r["vnorm"]) for r in codes.collect()
    }
    again = {
        r["vec_id"]: (tuple(r["code"]), r["vnorm"])
        for r in pq.pq_encode(emb.repartition(13), book).collect()
    }
    assert first == again


def test_adc_score_exact(emb, codes, book):
    """The JVM lookup-sum equals the driver-recomputed LUT sum exactly
    (same association order: left-to-right over j, same np.dot LUTs)."""
    probes = emb.filter(F.col("vec_id") % 101 == 0)
    got = {
        (r["probe_id"], r["vec_id"]): r["score"]
        for r in pq.pq_search(codes, probes, book, k=3).collect()
    }
    assert got
    cent = np.asarray(book["centroids"])
    pvecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in probes.collect()
    }
    cmeta = {
        r["vec_id"]: (list(r["code"]), r["vnorm"])
        for r in codes.collect()
    }
    for (pid, vid), score in got.items():
        p = pvecs[pid].reshape(8, 8)
        lut = np.einsum("ms,mks->mk", p, cent)  # same kernel as _probe_luts
        code, vnorm = cmeta[vid]
        acc = 0.0
        for j in range(8):  # left-associated, like adc_score
            acc = acc + float(lut[j, code[j]])
        pnorm = float(np.sqrt((pvecs[pid] ** 2).sum()))
        assert score == pytest.approx(acc / (vnorm * pnorm), rel=1e-12)


def test_rank_contract(codes, emb, book):
    out = pq.pq_search(codes, emb.filter(F.col("vec_id") % 101 == 0), book, k=4)
    pdf = out.toPandas()
    assert set(pdf.columns) == {"probe_id", "vec_id", "score", "rank"}
    for _, grp in pdf.groupby("probe_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= 4
        ordered = grp.sort_values("rank")
        assert (ordered["score"].diff().dropna() <= 1e-15).all()


def test_recall_vs_brute(emb, codes, book):
    """ADC top-10 candidate sets overlap the exact top-10 well enough to
    be a real shortlist generator (loose floor: the contract is 'useful
    pruning signal', the exactness contract is the rerank pin below)."""
    probes = emb.filter(F.col("vec_id") % 101 == 0)
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in knn_brute(emb, probes, k=10).collect()
    }
    approx = {
        (r["probe_id"], r["vec_id"])
        for r in pq.pq_search(codes, probes, book, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"ADC recall@10 collapsed: {recall}"


def test_rerank_full_shortlist_equals_brute(emb, codes, book):
    """With shortlist >= |corpus| the rerank path IS exact brute-force:
    same pairs, same ranks, scores equal to the shared cosine kernel."""
    n = emb.count()
    probes = emb.filter(F.col("vec_id") % 151 == 0)
    got = (
        pq.pq_search(
            codes, probes, book, k=5, shortlist=n, rerank_with=emb
        )
        .collect()
    )
    want = knn_brute(emb, probes, k=5).collect()
    key = lambda r: (r["probe_id"], r["rank"])
    got = sorted(got, key=key)
    want = sorted(want, key=key)
    assert [(r["probe_id"], r["vec_id"], r["rank"]) for r in got] == [
        (r["probe_id"], r["vec_id"], r["rank"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_rerank_shortlist_recall_beats_raw_adc(emb, codes, book):
    """The production pattern: a 4x shortlist + exact rerank recovers
    strictly more of the exact top-10 than raw ADC ranking."""
    probes = emb.filter(F.col("vec_id") % 101 == 0)
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in knn_brute(emb, probes, k=10).collect()
    }
    rr = {
        (r["probe_id"], r["vec_id"])
        for r in pq.pq_search(
            codes, probes, book, k=10, shortlist=80, rerank_with=emb
        ).collect()
    }
    raw = {
        (r["probe_id"], r["vec_id"])
        for r in pq.pq_search(codes, probes, book, k=10).collect()
    }
    assert len(exact & rr) >= len(exact & raw)
    assert len(exact & rr) / len(exact) >= 0.6


def test_search_plan_broadcasts_probes(codes, emb, book, spark):
    """The corpus side must never shuffle: probes broadcast, scoring is
    a BroadcastNestedLoopJoin over the code scan, and the only exchange
    is the top-k window's partitionBy(probe_id)."""
    probes = emb.filter(F.col("vec_id") % 101 == 0)
    plan = (
        pq.pq_search(codes, probes, book, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rerank_respects_non_default_dim(spark):
    """The rerank path must follow the codebook's dim: with 8-dim
    vectors the fixed 64-wide kernel would NULL every norm and return
    an empty result (the r16 review finding)."""
    import math

    rows = [(i, [float((i * 7 + j * 3) % 10 - 5) for j in range(8)]) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    book = pq.pq_train(df, m=2, k=4, iters=4, dim=8, sample_cap=100)
    codes = pq.pq_encode(df, book)
    probes = df.filter(F.col("vec_id") % 10 == 0)
    out = pq.pq_search(
        codes, probes, book, k=3, shortlist=40, rerank_with=df
    ).collect()
    assert out  # non-empty: norms computed at dim=8
    # spot-check one exact cosine against numpy
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    r0 = out[0]
    a, b = vecs[r0["probe_id"]], vecs[r0["vec_id"]]
    want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert math.isfinite(r0["score"])
    assert r0["score"] == pytest.approx(want, rel=1e-9)


# --- sample prefilter (r19: TakeOrdered merge fan-in bound) -----------------


def test_collect_sample_prefilter_matches_exact(spark, emb):
    """Forced prefilter path == plain exact path, bit-for-bit, on a
    wide scan with duplicate vectors straddling hash ties."""
    wide = emb.unionByName(emb.limit(64)).repartition(96)
    plain = pq._collect_sample(wide, "embedding", 64, 200, fanin_max=1 << 30)
    pref = pq._collect_sample(wide, "embedding", 64, 200, fanin_max=0)
    assert plain.shape == pref.shape
    assert np.array_equal(plain, pref)


def test_collect_sample_prefilter_fallback(spark, emb, monkeypatch):
    """A threshold that underestimates (margin forced to 0 -> zero
    survivors) must fall back to the exact unfiltered scan."""
    monkeypatch.setattr(pq, "SAMPLE_MARGIN", 0)
    wide = emb.repartition(96)
    plain = pq._collect_sample(wide, "embedding", 64, 150, fanin_max=1 << 30)
    pref = pq._collect_sample(wide, "embedding", 64, 150, fanin_max=0)
    assert np.array_equal(plain, pref)


def test_collect_sample_prefilter_small_n_guard(spark, emb):
    """n <= margin*cap (including n < cap, where a prefilter could drop
    sample members): the relation passes through unfiltered."""
    few = emb.limit(120).repartition(70)
    plain = pq._collect_sample(few, "embedding", 64, 100, fanin_max=1 << 30)
    pref = pq._collect_sample(few, "embedding", 64, 100, fanin_max=0)
    assert np.array_equal(plain, pref)


def test_collect_sample_default_gate_uses_partition_count(spark, emb):
    """Default fan-in gate: a narrow scan keeps the single-pass exact
    path (prefilter only engages past SAMPLE_FANIN_MAX partitions)."""
    narrow = emb.coalesce(4)
    got = pq._collect_sample(narrow, "embedding", 64, 200)
    plain = pq._collect_sample(narrow, "embedding", 64, 200, fanin_max=1 << 30)
    assert np.array_equal(got, plain)
