"""Continuous corpus ingestion (streaming/corpus_stream.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import corpus_pipeline as CP
from example_dms_dataexport_spark.operators import dedup, text_analysis
from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse
from example_dms_dataexport_spark.streaming.corpus_stream import (
    FP_COL,
    start_corpus_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"
SPEC = [{"op": "quality", "min_quality": 0.4}]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _land(spark, docs, landing, n_batches=3):
    """Batch i holds doc_id % n == i PLUS a replica of batch 0's first
    few docs under shifted ids (cross-batch content dups)."""
    os.makedirs(landing, exist_ok=True)
    for i in range(n_batches):
        part = docs.filter(F.col("doc_id") % n_batches == i)
        if i > 0:
            dups = (
                docs.filter(F.col("doc_id") % n_batches == 0)
                .orderBy("doc_id")
                .limit(3)
                .select(
                    (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                    "text",
                )
            )
            part = part.unionByName(dups)
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"batch-{i}")
        )


def _expected_ids(docs):
    """Quality-filtered docs, exact-deduped by content with min-id wins
    (batch order = id order here, so first-arrival == min-id)."""
    kept = text_analysis.quality_filter(docs, min_quality=0.4)
    return {
        r["doc_id"] for r in dedup.exact_dedup(kept).collect()
    }


def test_stream_builds_the_cleaned_deduped_corpus(spark, docs, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing)

    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    tbl = wh.read(spark, "corpus")
    got = {r["doc_id"] for r in tbl.select("doc_id").collect()}
    # planted cross-batch replicas (ids >= 1M) must all be dropped:
    # their content already landed in an earlier batch
    assert not {i for i in got if i >= 1_000_000}
    assert got == _expected_ids(docs)
    assert FP_COL in tbl.columns
    # content-unique by construction
    assert tbl.select(FP_COL).distinct().count() == len(got)


def test_appends_stage_coalesced_files(spark, docs, tmp_path):
    """A micro-batch append lands O(1) files, not one per static
    shuffle partition: the staging write's no-key AQE rebalance (and
    the first commit's rebalance opt-in) coalesce each batch to
    advisory-sized files, so minute-grain ingest cannot accrete tiny
    files — and the per-file bloom manifest stays O(batches), not
    O(batches x partitions)."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing)

    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    data_files = [
        fn
        for dp, _, fns in os.walk(wh.path("corpus"))
        for fn in fns
        if fn.endswith(".parquet")
    ]
    # 3 batches, each small enough for AQE to coalesce to one
    # partition: a couple of files of slack, never the 8-per-batch the
    # static shuffle partitioning would stage
    assert len(data_files) <= 5, data_files
    bm = wh.bloom("corpus")
    assert bm is not None and len(bm["files"]) == len(data_files)


def test_replay_and_restart_are_no_ops(spark, docs, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing)
    ckpt = str(tmp_path / "ckpt")

    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, ckpt
    )
    q.awaitTermination(180)

    def inodes():
        out = {}
        for dp, _, fns in os.walk(wh.path("corpus")):
            for fn in fns:
                if fn.endswith(".parquet"):
                    p = os.path.join(dp, fn)
                    out[os.path.relpath(p, wh.path("corpus"))] = os.stat(
                        p
                    ).st_ino
        return out

    before = inodes()
    # same checkpoint, no new files
    q2 = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, ckpt
    )
    q2.awaitTermination(180)
    assert inodes() == before
    # lost checkpoint: every batch re-delivers; id+fingerprint
    # reconciliation drops everything
    shutil.rmtree(ckpt)
    q3 = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt2")
    )
    q3.awaitTermination(180)
    assert inodes() == before


def test_corpus_relative_stages_refuse_at_start(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    for op in (
        {"op": "exact_dedup"},
        {"op": "near_dedup", "method": "minhash", "threshold": 0.5},
        {"op": "chunk", "chunk_size": 8, "overlap": 0},
        {"op": "perplexity", "min_logprob": -4.0},
    ):
        with pytest.raises(ValueError, match="corpus-relative"):
            start_corpus_ingest_stream(
                spark, str(tmp_path / "landing") + "/*", wh, "c",
                [op], str(tmp_path / "ckpt"),
            )


def test_streamed_result_matches_the_batch_pipeline(spark, docs, tmp_path):
    """The whole point: streaming ingestion lands exactly what the
    batch pipeline (same spec + exact dedup) would keep over the same
    corpus."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing, n_batches=4)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    batch = CP.run_corpus_pipeline(
        spark, docs, SPEC + [{"op": "exact_dedup"}]
    )
    got = {r["doc_id"] for r in wh.read(spark, "corpus").collect()}
    assert got == {r["doc_id"] for r in batch.collect()}


def test_frozen_lm_perplexity_streams(spark, docs, tmp_path):
    """perplexity with a frozen LM passes stream admission and filters
    per batch exactly as the batch stage would."""
    lm = text_analysis.train_unigram_lm(docs)
    lp = text_analysis.unigram_logprob_frozen(docs, lm)
    lo = lp.approxQuantile("logprob", [0.3], 0.0)[0]
    spec = [{"op": "perplexity", "lm": lm, "min_logprob": lo}]

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", spec, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    batch = CP.run_corpus_pipeline(
        spark, docs, spec + [{"op": "exact_dedup"}]
    )
    got = {r["doc_id"] for r in wh.read(spark, "corpus").collect()}
    assert got == {r["doc_id"] for r in batch.collect()}
    # and the un-frozen variant still refuses
    with pytest.raises(ValueError, match="corpus-relative"):
        start_corpus_ingest_stream(
            spark, landing + "/*", wh, "c2",
            [{"op": "perplexity", "min_logprob": lo}],
            str(tmp_path / "ckpt2"),
        )


def test_reconciliation_is_bloom_pruned_and_manifest_survives(
    spark, docs, tmp_path
):
    """r18 (verdict task 3): the per-batch reconciliation must not scan
    the corpus — the table carries a (doc_id, _fp) bloom manifest from
    birth, appends EXTEND it, and a batch's existing-key probe opens
    only bloom-hit files. Result identity with the full anti-join is
    pinned by test_streamed_result_matches_the_batch_pipeline above."""
    from example_dms_dataexport_spark.streaming.corpus_stream import (
        _existing_keys,
    )

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing, n_batches=4)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    bm = wh.bloom("corpus")
    assert bm is not None, "manifest dropped by an append"
    assert set(bm["cols"]) == {"doc_id", FP_COL}
    n_files = len(bm["files"])
    assert n_files >= 4  # one initial commit + one file per append

    # probe a handful of landed ids: the pruned read must open a
    # STRICT SUBSET of the table's files and return exactly those rows
    some = [
        r["doc_id"]
        for r in wh.read(spark, "corpus").select("doc_id").limit(3).collect()
    ]
    ex = _existing_keys(spark, wh, "corpus", "doc_id", some)
    assert ex is not None, "manifest did not serve the pruned probe"
    opened = ex.inputFiles()
    assert 0 < len(opened) < n_files, (len(opened), n_files)
    assert {r["doc_id"] for r in ex.collect()} == set(some)
    # absent keys open no files at all on a miss-everywhere probe set
    ex_miss = _existing_keys(
        spark, wh, "corpus", "doc_id", [10**15, 10**15 + 1]
    )
    assert ex_miss is not None and ex_miss.count() == 0


def test_null_text_reconciles_like_batch_exact_dedup(spark, tmp_path):
    """r17 advisor finding: NULL-text docs must group under the _fp
    sentinel — ONE survivor lands (min-id, first batch) and replicas in
    later batches reconcile away instead of accreting through a
    never-matching NULL-keyed anti-join."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    rows0 = [(1, "alpha beta gamma delta"), (2, None), (3, None)]
    rows1 = [(10, None), (11, "epsilon zeta eta theta")]
    spark.createDataFrame(rows0, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(landing, "batch-0"))
    spark.createDataFrame(rows1, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(landing, "batch-1"))

    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus",
        [{"op": "sample", "rate": 1.0}], str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    tbl = wh.read(spark, "corpus")
    nulls = tbl.filter(F.col("text").isNull()).collect()
    assert [r["doc_id"] for r in nulls] == [2], nulls  # min-id, batch 0
    got = {r["doc_id"] for r in tbl.collect()}
    assert got == {1, 2, 11}
    # replay from a fresh checkpoint: still exactly one NULL survivor
    q2 = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus",
        [{"op": "sample", "rate": 1.0}], str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert wh.read(spark, "corpus").filter(
        F.col("text").isNull()
    ).count() == 1


@pytest.mark.slow
def test_stale_manifest_falls_back_and_heals(spark, docs, tmp_path):
    """A crashed append leaves the corpus without its bloom manifest;
    the next batch must reconcile through the full-anti-join fallback
    (no silent mis-prune, no batch failure) and then HEAL the manifest
    so later batches prune again."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing, n_batches=2)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    expected = _expected_ids(docs)
    assert {
        r["doc_id"] for r in wh.read(spark, "corpus").collect()
    } == expected

    # simulate the crash window: manifest gone, files present
    os.remove(os.path.join(wh.path("corpus"), "_bloom.json"))
    # a third landing file: half replays batch 0's content under new
    # ids (must reconcile away via the FALLBACK), half is genuinely new
    fresh_rows = [(5_000_001, "omega psi chi phi upsilon tau")]
    replay = (
        docs.orderBy("doc_id")
        .limit(2)
        .select((F.col("doc_id") + 7_000_000).alias("doc_id"), "text")
    )
    extra = spark.createDataFrame(
        fresh_rows, "doc_id long, text string"
    ).unionByName(replay)
    extra.coalesce(1).write.parquet(os.path.join(landing, "batch-9"))

    q2 = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(180)
    got = {r["doc_id"] for r in wh.read(spark, "corpus").collect()}
    assert not {i for i in got if i >= 7_000_000}  # replays dropped
    # the genuinely-new doc landed iff it passes the quality gate —
    # either way no replay content re-landed and nothing was lost
    assert got - {5_000_001} == expected
    # manifest healed: pruned probes serve again without a rebuild
    bm = wh.bloom("corpus")
    assert bm is not None and set(bm["cols"]) == {"doc_id", FP_COL}
    some = [r["doc_id"] for r in wh.read(spark, "corpus").limit(2).collect()]
    hit = wh.read_bloom_keys(spark, "corpus", "doc_id", some)
    assert {r["doc_id"] for r in hit.select("doc_id").collect()} == set(some)


@pytest.mark.slow
def test_stream_appends_into_a_declared_bucketed_corpus(
    spark, docs, tmp_path
):
    """r18 (verdict task 4): a corpus table DECLARED bucketed (the
    co-located-join layout) now takes the stream's O(batch) appends —
    batches land through the bucket-preserving stager, the layout and
    its bloom manifest survive, and reconciliation still prunes."""
    from pyspark.sql import functions as _F

    from example_dms_dataexport_spark.functions import texthash as TH
    from example_dms_dataexport_spark.streaming.corpus_stream import NULL_FP

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    spec = [{"op": "sample", "rate": 1.0}]
    seed = (
        docs.filter(_F.col("doc_id") % 3 == 0)
        .withColumn(
            FP_COL,
            _F.coalesce(
                TH.fingerprint(_F.col("text")),
                _F.lit(NULL_FP).cast("long"),
            ),
        )
    )
    wh.write_bucketed(
        seed, "corpus", ["doc_id"], 4,
        bloom_cols=["doc_id", FP_COL],
    )
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing, n_batches=3)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", spec, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    # layout survived; manifest live and extended
    assert wh.bucket_spec("corpus")["n_buckets"] == 4
    bm = wh.bloom("corpus")
    assert bm is not None and set(bm["cols"]) == {"doc_id", FP_COL}
    # contents: seed ∪ stream batches, exact-deduped by content with
    # seed-first/min-id tie rules — every seed doc survives, and no
    # planted cross-batch replica (ids >= 1M) re-lands
    got = {r["doc_id"] for r in wh.read_bucketed(spark, "corpus").collect()}
    assert not {i for i in got if i >= 1_000_000}
    assert {r["doc_id"] for r in seed.select("doc_id").collect()} <= got
    # the bucketed layout still serves a zero-input-exchange join
    from example_dms_dataexport_spark.plans import exchange_count

    o = wh.read_bucketed(spark, "corpus")
    joined = o.hint("merge").join(
        wh.read_bucketed(spark, "corpus").alias("r"),
        o["doc_id"] == _F.col("r.doc_id"),
    )
    assert exchange_count(joined.groupBy(o["doc_id"]).count()) <= 1


def test_oversized_batch_falls_back_without_o_corpus_heal(
    spark, docs, tmp_path, monkeypatch
):
    """r18 advisor finding: a batch above the probe cap takes the full
    anti-join fallback ONCE but must NOT pay any manifest rebuild — the
    append already extends a live manifest in O(batch), so it stays
    exact and the next probe-bounded batch prunes again. heal_bloom /
    write_bloom are never invoked."""
    from example_dms_dataexport_spark.streaming import corpus_stream as CS

    monkeypatch.setattr(CS, "RECONCILE_PROBE_CAP", 1)
    heals: list = []
    rebuilds: list = []
    orig_heal = ParquetWarehouse.heal_bloom
    orig_wb = ParquetWarehouse.write_bloom
    monkeypatch.setattr(
        ParquetWarehouse,
        "heal_bloom",
        lambda self, *a, **k: (heals.append(a), orig_heal(self, *a, **k))[1],
    )
    monkeypatch.setattr(
        ParquetWarehouse,
        "write_bloom",
        lambda self, *a, **k: (rebuilds.append(a), orig_wb(self, *a, **k))[1],
    )
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    _land(spark, docs, landing, n_batches=3)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", SPEC, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert heals == [] and rebuilds == []
    assert {
        r["doc_id"] for r in wh.read(spark, "corpus").collect()
    } == _expected_ids(docs)
    # the manifest stayed EXACT through the oversized-batch appends:
    # pruned probes serve with no stale refusal
    some = [r["doc_id"] for r in wh.read(spark, "corpus").limit(2).collect()]
    hit = wh.read_bloom_keys(spark, "corpus", "doc_id", some)
    assert {r["doc_id"] for r in hit.select("doc_id").collect()} == set(some)


@pytest.mark.slow
def test_defer_erasure_composes_with_continuous_ingest(spark, docs, tmp_path):
    """r19 (verdict task 4): defer-mode GDPR on a continuously-ingested
    corpus must not stall the stream — appends mask the batch against
    the pending set instead of refusing. An erased subject re-asserted
    mid-pendency stays erased through every window (before and after
    materialization), and genuinely new docs keep landing."""
    from example_dms_dataexport_spark.streaming.erasure_stream import (
        start_erasure_stream,
    )

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    spec = [{"op": "sample", "rate": 1.0}]
    _land(spark, docs, landing, n_batches=2)
    q = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", spec, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    assert q.exception() is None
    base_ids = {r["doc_id"] for r in wh.read(spark, "corpus").collect()}
    victims = sorted(base_ids)[:2]

    req_dir = str(tmp_path / "requests")
    spark.createDataFrame(
        [(v,) for v in victims], "doc_id long"
    ).coalesce(1).write.parquet(os.path.join(req_dir, "r0"))
    reqs = spark.readStream.schema("doc_id long").parquet(req_dir + "/*")
    eq = start_erasure_stream(
        spark, reqs, wh, "corpus", "doc_id", str(tmp_path / "eckpt"),
        mode="defer",
    )
    eq.awaitTermination(120)
    assert eq.exception() is None
    assert wh.pending_deletes("corpus") is not None
    assert not set(victims) & {
        r["doc_id"] for r in wh.read(spark, "corpus").collect()
    }

    # ingest continues WHILE the deletes pend: a re-assertion of an
    # erased subject (same id + text) plus a genuinely new doc — the
    # batch must COMMIT (pre-r19 every such append failed and stalled
    # the stream) and the subject must stay erased
    victim_rows = docs.filter(F.col("doc_id") == victims[0])
    fresh = spark.createDataFrame(
        [(9_000_001, "brand new unseen sentence for the defer fold")],
        "doc_id long, text string",
    )
    victim_rows.unionByName(fresh).coalesce(1).write.parquet(
        os.path.join(landing, "batch-9")
    )
    q2 = start_corpus_ingest_stream(
        spark, landing + "/*", wh, "corpus", spec, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(180)
    assert q2.exception() is None
    got = {r["doc_id"] for r in wh.read(spark, "corpus").collect()}
    assert 9_000_001 in got
    assert not set(victims) & got  # re-asserted subject stays erased
    # materialization drops the sidecar; crash-window semantics mean
    # nothing can resurrect — the masked rows never landed in any file
    wh.materialize_deletes(spark, "corpus")
    assert wh.pending_deletes("corpus") is None
    got2 = {r["doc_id"] for r in wh.read(spark, "corpus").collect()}
    assert 9_000_001 in got2 and not set(victims) & got2
