"""Frozen side-input relation cache (functions/relcache): the r19
per-batch-overhead optimization — a frozen model's JVM relation builds
once per (model, session) and is reused by every later scoring call."""

from example_dms_dataexport_spark.functions import relcache
from example_dms_dataexport_spark.functions.relcache import frozen_relation


def _counting_build(log, value):
    def build():
        log.append(1)
        return value

    return build


def test_same_owner_same_session_reuses():
    relcache._CACHE.clear()
    owner, spark, rel = {"w": 1}, object(), object()
    log = []
    a = frozen_relation(spark, owner, "t", _counting_build(log, rel))
    b = frozen_relation(spark, owner, "t", _counting_build(log, rel))
    assert a is rel and b is rel
    assert log == [1], "second call must not rebuild"


def test_distinct_owner_or_session_rebuilds():
    relcache._CACHE.clear()
    spark = object()
    log = []
    frozen_relation(spark, {"w": 1}, "t", _counting_build(log, object()))
    # equal-content but DIFFERENT object: a retrained model never hits
    frozen_relation(spark, {"w": 1}, "t", _counting_build(log, object()))
    assert len(log) == 2
    # same owner, new session (e.g. a new stream run): rebuild
    owner = {"w": 2}
    frozen_relation(spark, owner, "t", _counting_build(log, object()))
    frozen_relation(object(), owner, "t", _counting_build(log, object()))
    assert len(log) == 4


def test_tags_disambiguate_and_lru_bounds():
    relcache._CACHE.clear()
    spark, owner = object(), {"w": 1}
    log = []
    a = frozen_relation(spark, owner, "a", _counting_build(log, "ra"))
    b = frozen_relation(spark, owner, "b", _counting_build(log, "rb"))
    assert (a, b) == ("ra", "rb") and len(log) == 2
    # overflow the LRU: the oldest entries evict, cache stays bounded
    for i in range(relcache._MAX + 3):
        frozen_relation(spark, {"i": i}, "t", _counting_build(log, i))
    assert len(relcache._CACHE) == relcache._MAX


def test_classify_lang_reuses_model_relation(spark):
    from example_dms_dataexport_spark.operators.lang_model import (
        classify_lang,
        train_lang_model,
    )

    labeled = spark.createDataFrame(
        [(1, "the cat sat on the mat", "en"),
         (2, "le chat est sur le tapis", "fr"),
         (3, "the dog ate the food", "en"),
         (4, "le chien mange le pain", "fr")],
        "doc_id long, text string, lang string",
    )
    model = train_lang_model(labeled)
    docs = spark.createDataFrame(
        [(10, "the cat ate"), (11, "le chat mange")],
        "doc_id long, text string",
    )
    relcache._CACHE.clear()
    r1 = {(r["doc_id"], r["lang_pred"]) for r in classify_lang(docs, model).collect()}
    n_after_first = len(relcache._CACHE)
    r2 = {(r["doc_id"], r["lang_pred"]) for r in classify_lang(docs, model).collect()}
    assert r1 == r2 == {(10, "en"), (11, "fr")}
    # the second scoring call hit the cache instead of adding an entry
    assert len(relcache._CACHE) == n_after_first == 1
