"""Trainable char-n-gram language ID (operators/lang_model.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import lang_model as LM

# Deterministic labeled fixture with genuinely distinct character
# distributions (the sf testdata's `lang` column is synthetic metadata
# uncorrelated with its text, so it can't certify accuracy — it still
# exercises the distributed shape below).
WORDS = {
    "en": ("the quick brown fox jumps over lazy dogs with great "
           "enthusiasm and remarkable speed through fields").split(),
    "de": ("der schnelle braune fuchs springt ueber faule hunde mit "
           "grosser begeisterung und bemerkenswerter geschwindigkeit").split(),
    "fr": ("le renard brun rapide saute par dessus les chiens "
           "paresseux avec beaucoup enthousiasme et vitesse").split(),
}


def _corpus(spark, docs_per_lang=40, words_per_doc=12, salt=0):
    rows = []
    doc_id = 0
    for lang, words in sorted(WORDS.items()):
        for d in range(docs_per_lang):
            picks = [
                words[(d * 7 + i * 3 + salt) % len(words)]
                for i in range(words_per_doc)
            ]
            rows.append((doc_id, " ".join(picks), lang))
            doc_id += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


@pytest.fixture(scope="module")
def labeled(spark):
    return _corpus(spark)


@pytest.fixture(scope="module")
def model(labeled):
    return LM.train_lang_model(labeled)


def test_holdout_accuracy(spark, model):
    """A disjoint draw from the same per-language word lists classifies
    correctly — the profiles carry real signal, not doc identity."""
    test = _corpus(spark, docs_per_lang=15, words_per_doc=10, salt=101)
    pred = LM.classify_lang(test, model)
    joined = pred.join(test.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    ok = joined.filter(F.col("lang_pred") == F.col("lang")).count()
    assert n == 45
    assert ok / n >= 0.95
    # margins are positive log-odds over the runner-up
    assert joined.filter(F.col("margin") <= 0).count() == 0


def test_model_is_a_pure_function_of_the_corpus(spark, labeled, model):
    """Repartitioning the training input changes nothing: same profile
    table, same priors/floors (ties in the top-V cut break on trigram)."""
    m2 = LM.train_lang_model(labeled.repartition(13))
    assert m2["vocab_size"] == model["vocab_size"]
    assert m2["langs"] == model["langs"]
    assert sorted(m2["table"]) == sorted(model["table"])


def test_short_text_predicts_und_with_null_margin(spark, model):
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "the quick brown fox")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["lang_pred"], r["margin"])
        for r in LM.classify_lang(df, model).collect()
    }
    assert got[1] == (LM.UND, None)
    assert got[2] == (LM.UND, None)
    assert got[3][0] == "en" and got[3][1] > 0


def test_scoring_plan_is_jvm_only_with_broadcast_model(spark, model):
    """No Python evaluation anywhere in the scoring plan, and the model
    relation joins as a broadcast — the 100 TB scoring pass is one
    explode + broadcast join + doc-keyed aggregations."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id long, text string"
    )
    plan = (
        LM.classify_lang(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_profile_truncation_bounds_the_model(spark, labeled):
    m = LM.train_lang_model(labeled, top_per_lang=25)
    per_lang = {}
    for _, lang, _ in m["table"]:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert per_lang and all(v <= 25 for v in per_lang.values())


def test_runs_distributed_over_the_documents_table(spark):
    """Scale-shape check on the real table: train on the synthetic
    labels and score the corpus — every doc gets exactly one
    prediction from the label set (accuracy is meaningless here; the
    labels are uncorrelated with the text by construction)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    model = LM.train_lang_model(docs)
    pred = LM.classify_lang(docs.drop("lang"), model)
    assert pred.count() == docs.count()
    assert pred.select("doc_id").distinct().count() == docs.count()
    seen = {r["lang_pred"] for r in pred.select("lang_pred").distinct().collect()}
    assert seen <= set(model["langs"]) | {LM.UND}


def test_model_lang_pipeline_stage(spark, labeled, model):
    """The learned lang gate composes in the spec runner like
    model_quality: keeps exactly the docs classify_lang assigns the
    requested language (optional margin floor), and spec validation
    fails fast on missing params."""
    import pytest as _pytest

    from example_dms_dataexport_spark.operators import corpus_pipeline as CP

    test = _corpus(spark, docs_per_lang=10, words_per_doc=10, salt=7)
    kept = CP.run_corpus_pipeline(
        spark,
        test.select("doc_id", "text"),
        [{"op": "model_lang", "model": model, "lang": "de"}],
    )
    want = {
        r["doc_id"]
        for r in LM.classify_lang(test, model)
        .filter(F.col("lang_pred") == "de")
        .collect()
    }
    assert {r["doc_id"] for r in kept.collect()} == want
    assert len(want) > 0
    with _pytest.raises(ValueError, match="model_lang needs"):
        CP.validate_spec([{"op": "model_lang", "lang": "de"}])
    with _pytest.raises(ValueError, match="unknown"):
        CP.validate_spec(
            [{"op": "model_lang", "model": model, "lang": "de", "nope": 1}]
        )


def _py_nb_reference(train_rows, test_rows, n=3, top_per_lang=2000):
    """Pure-Python replication of train_lang_model + classify_lang
    (micro-unit fixed point, same tie rules) — the property suite's
    engine-free twin."""
    import math
    from collections import Counter, defaultdict

    def grams(t):
        return [t[i : i + n] for i in range(len(t) - n + 1)]

    by_lang = defaultdict(Counter)
    docs_n = Counter()
    for _, text, lang in train_rows:
        docs_n[lang] += 1
        by_lang[lang].update(grams(text))
    kept = {}
    for lang, c in by_lang.items():
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        kept[lang] = dict(ordered[:top_per_lang])
    vocab = {t for c in kept.values() for t in c}
    total_docs = sum(docs_n.values())

    def micro(x):
        return int(math.floor(x * 1_000_000 + 0.5))

    langs = {}
    for lang in docs_n:
        tot = sum(kept.get(lang, {}).values())
        langs[lang] = (
            micro(math.log(docs_n[lang] / total_docs)),
            micro(math.log(1.0 / (tot + len(vocab)))),
            tot,
        )
    logp = {
        (lang, t): micro(math.log((c + 1.0) / (langs[lang][2] + len(vocab))))
        for lang, cc in kept.items()
        for t, c in cc.items()
    }
    out = {}
    for did, text in test_rows:
        gs = Counter(grams(text))
        nt = sum(gs.values())
        if nt == 0:
            out[did] = ("und", None)
            continue
        scores = {}
        for lang, (prior, floor, _) in langs.items():
            s = prior + nt * floor
            for t, c in gs.items():
                lp = logp.get((lang, t))
                if lp is not None:
                    s += c * (lp - floor)
            scores[lang] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = (
            (ranked[0][1] - ranked[1][1]) / 1e6 if len(ranked) > 1 else 0.0
        )
        out[did] = (ranked[0][0], margin)
    return out


@pytest.mark.slow
def test_property_distributed_equals_pure_python(spark):
    """Randomized corpora (hypothesis): the distributed train+classify
    pipeline is EXACTLY the pure-Python NB — every prediction and every
    micro-exact margin — regardless of text shape, label skew, or
    profile-cut ties."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from("abc x")
    text = st.text(alphabet=alphabet, min_size=0, max_size=24)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(text, st.sampled_from(["l1", "l2", "l3"])),
            min_size=2,
            max_size=14,
        ).filter(lambda rows: any(len(t) >= 3 for t, _ in rows)),
        st.integers(min_value=1, max_value=6),
    )
    def run(train, top):
        train_rows = [
            (i, t, lang) for i, (t, lang) in enumerate(train)
        ]
        df = spark.createDataFrame(
            train_rows, "doc_id long, text string, lang string"
        )
        model = LM.train_lang_model(df, top_per_lang=top)
        got = {
            r["doc_id"]: (r["lang_pred"], r["margin"])
            for r in LM.classify_lang(df.drop("lang"), model).collect()
        }
        want = _py_nb_reference(
            train_rows, [(i, t) for i, t, _ in train_rows], top_per_lang=top
        )
        assert set(got) == set(want)
        for did, (lang, margin) in want.items():
            assert got[did][0] == lang, (did, got[did], want[did])
            if margin is None:
                assert got[did][1] is None
            else:
                assert got[did][1] == pytest.approx(margin, abs=1e-9)

    run()
