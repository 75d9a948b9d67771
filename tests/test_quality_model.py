"""Model-based quality classifier (operators/quality_model.py).

Fixture: the sf0.001 documents table as trusted positives; negatives
are a deterministic gibberish restatement of the same corpus (every
token reversed — same lengths and structure, disjoint vocabulary), so
the classifier must learn VOCABULARY, the signal the heuristic
length/punctuation score cannot see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import quality_model as QM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def gibberish(docs):
    # reverse every token: "the fast key" -> "eht tsaf yek" — out-of-
    # vocabulary everywhere, identical document geometry
    rev = F.array_join(
        F.transform(F.split(F.col("text"), " "), F.reverse), " "
    )
    return docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), rev.alias("text")
    )


@pytest.fixture(scope="module")
def clf(docs, gibberish):
    # train on even doc_ids, hold out odd ones
    return QM.train_quality_classifier(
        docs.filter(F.col("doc_id") % 2 == 0),
        gibberish.filter(F.col("doc_id") % 2 == 0),
    )


def test_separates_held_out(docs, gibberish, clf):
    """Held-out positives score high, held-out gibberish scores low —
    the vocabulary signal generalizes off the training split."""
    pos = QM.score_quality(docs.filter(F.col("doc_id") % 2 == 1), clf)
    neg = QM.score_quality(gibberish.filter(F.col("doc_id") % 2 == 1), clf)
    p = [r["quality_prob"] for r in pos.collect()]
    n = [r["quality_prob"] for r in neg.collect()]
    assert p and n
    assert sum(s > 0.5 for s in p) / len(p) >= 0.95
    assert sum(s < 0.5 for s in n) / len(n) >= 0.95


def test_auc_on_held_out(docs, gibberish, clf):
    pos = [
        r["quality_prob"]
        for r in QM.score_quality(
            docs.filter(F.col("doc_id") % 2 == 1), clf
        ).collect()
    ]
    neg = [
        r["quality_prob"]
        for r in QM.score_quality(
            gibberish.filter(F.col("doc_id") % 2 == 1), clf
        ).collect()
    ]
    # exact pairwise AUC (small held-out set)
    wins = sum(
        (1.0 if a > b else 0.5 if a == b else 0.0) for a in pos for b in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.98, f"held-out AUC collapsed: {auc}"


def test_score_keeps_every_row_and_schema(docs, clf):
    out = QM.score_quality(docs, clf)
    assert out.columns == ["doc_id", "quality_prob"]
    assert out.count() == docs.count()
    assert out.filter(
        (F.col("quality_prob") < 0) | (F.col("quality_prob") > 1)
    ).count() == 0


def test_scoring_deterministic(docs, clf):
    a = {r["doc_id"]: r["quality_prob"] for r in QM.score_quality(docs, clf).collect()}
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in QM.score_quality(docs.repartition(7), clf).collect()
    }
    assert a == b


def test_pareto_keep_reproducible_and_quality_skewed(docs, gibberish, clf):
    scored = QM.score_quality(docs.unionByName(gibberish), clf)
    kept1 = {r["doc_id"] for r in QM.pareto_keep(scored).collect()}
    kept2 = {r["doc_id"] for r in QM.pareto_keep(scored).collect()}
    assert kept1 == kept2  # hash-derived draw: reruns keep the same ids
    n_docs = docs.count()
    pos_kept = sum(1 for d in kept1 if d < 1_000_000)
    neg_kept = len(kept1) - pos_kept
    # high scorers almost all survive; low scorers only by Pareto luck
    assert pos_kept >= 0.9 * n_docs
    assert neg_kept <= 0.3 * n_docs


def test_pareto_keep_salt_changes_the_luck(docs, gibberish, clf):
    scored = QM.score_quality(docs.unionByName(gibberish), clf)
    k0 = {r["doc_id"] for r in QM.pareto_keep(scored, salt=0).collect()}
    k1 = {r["doc_id"] for r in QM.pareto_keep(scored, salt=1).collect()}
    assert k0 != k1  # different epoch salt -> different marginal keeps


def test_scoring_plan_is_shuffle_free(docs, clf):
    plan = (
        QM.score_quality(docs, clf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
