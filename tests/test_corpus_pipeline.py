"""Spec-driven corpus pipeline runner (operators/corpus_pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import corpus_pipeline as CP
from example_dms_dataexport_spark.operators import dedup, text_analysis

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_equals_the_handwritten_q38_chain(spark, docs):
    """The spec restatement of q38's stages keeps exactly the ids the
    hand-written composition keeps."""
    spec = [
        {"op": "quality_lang", "min_quality": 0.5, "lang": "en"},
        {"op": "exact_dedup"},
        {"op": "near_dedup", "method": "minhash", "threshold": 0.5},
    ]
    got = {
        r["doc_id"]
        for r in CP.run_corpus_pipeline(spark, docs, spec).collect()
    }
    kept = dedup.exact_dedup(
        text_analysis.quality_lang_gate(docs).select("doc_id", "text", "quality")
    )
    pairs = dedup.minhash_dedup_pairs(kept, threshold=0.5)
    want = {
        r["doc_id"] for r in dedup.cluster_survivors(kept, pairs).collect()
    }
    assert got == want


def test_apply_stage_fold_equals_composed_runner(spark, docs):
    """The ingest stream's per-stage composition (apply_stage + lazy
    localCheckpoint between stages — the r19 lineage-truncation path)
    keeps exactly the rows the one-DAG composed runner keeps. The spec
    includes a frozen model_quality stage (r19 advisor): the
    semi-join-on-self shape — score relation + join back — is the
    ~k^stages tree the truncation exists for, so the pin must cover it
    directly, not only one join-back gate."""
    from example_dms_dataexport_spark.operators import quality_model as QM

    gib = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.transform(F.split("text", " "), F.reverse), " "
        ).alias("text"),
    )
    clf = QM.train_quality_classifier(docs, gib)
    spec = [
        {"op": "quality", "min_quality": 0.4},
        {"op": "model_quality", "classifier": clf, "min_prob": 0.5},
        {"op": "repetition"},
        {"op": "sample", "rate": 0.9},
    ]
    CP.validate_spec(spec)
    composed = CP.run_corpus_pipeline(spark, docs, spec)
    staged = docs
    for st in spec:
        staged = CP.apply_stage(staged, st).localCheckpoint(eager=False)
    got = {tuple(r) for r in staged.collect()}
    want = {tuple(r) for r in composed.collect()}
    assert got == want and len(got) > 0
    assert staged.columns == composed.columns


def test_apply_stage_unknown_op_fails_with_value_error(spark, docs):
    """apply_stage mirrors validate_spec's descriptive fail-fast for a
    caller that skipped validation (r19 advisor — was a bare KeyError)."""
    with pytest.raises(ValueError, match="unknown stage op"):
        CP.apply_stage(docs, {"op": "nope"})
    with pytest.raises(ValueError, match="unknown stage op"):
        CP.apply_stage(docs, {})


def test_report_counts_are_monotone_filters(spark, docs):
    spec = [
        {"op": "quality", "min_quality": 0.4},
        {"op": "repetition"},
        {"op": "exact_dedup"},
        {"op": "sample", "rate": 0.5},
    ]
    out, rep = CP.run_corpus_pipeline(spark, docs, spec, report=True)
    assert [r["op"] for r in rep] == [s["op"] for s in spec]
    n = docs.count()
    for r in rep:
        assert r["rows_in"] >= r["rows_out"] >= 0  # every stage filters
        assert r["rows_in"] <= n
        n = r["rows_out"]
    assert out.count() == rep[-1]["rows_out"]


def test_decontam_and_model_quality_stages(spark, docs):
    from example_dms_dataexport_spark.operators import quality_model as QM

    ref = docs.filter(F.col("doc_id") % 97 == 0)
    gib = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.transform(F.split("text", " "), F.reverse), " "
        ).alias("text"),
    )
    clf = QM.train_quality_classifier(docs, gib)
    spec = [
        {"op": "decontam", "ref": ref, "n": 3, "max_shared": 0},
        {"op": "model_quality", "classifier": clf, "min_prob": 0.5},
    ]
    out = CP.run_corpus_pipeline(
        spark, docs.unionByName(gib), spec
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids  # real docs survive
    assert not {i for i in ids if i >= 1_000_000}  # gibberish filtered
    assert not ids & {r["doc_id"] for r in ref.collect()}  # ref-overlap gone


def test_strict_validation_fails_fast(spark, docs):
    with pytest.raises(ValueError, match="unknown op"):
        CP.validate_spec([{"op": "nope"}])
    with pytest.raises(ValueError, match="unknown params"):
        CP.validate_spec([{"op": "quality", "min_qual": 0.5}])
    with pytest.raises(ValueError, match="non-empty list"):
        CP.validate_spec([])
    with pytest.raises(ValueError, match="exactly one of"):
        CP.run_corpus_pipeline(
            spark, docs, [{"op": "model_quality", "classifier": {}}]
        )
    with pytest.raises(ValueError, match="needs 'ref'"):
        CP.run_corpus_pipeline(spark, docs, [{"op": "decontam"}])
    with pytest.raises(ValueError, match="not in minhash"):
        CP.run_corpus_pipeline(
            spark, docs, [{"op": "near_dedup", "method": "magic"}]
        )


def test_lazy_by_default(spark, docs):
    """Without report, composing stages triggers no Spark job (the spec
    folds into one lazy plan like the hand-written chain)."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    CP.run_corpus_pipeline(
        spark,
        docs,
        [
            {"op": "quality", "min_quality": 0.5},
            {"op": "exact_dedup"},
            {"op": "sample", "rate": 0.5},
        ],
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_export_hand_off(spark, docs, tmp_path):
    """Pipeline result -> each sink in one call, manifests returned."""
    out = CP.run_corpus_pipeline(
        spark, docs, [{"op": "quality", "min_quality": 0.5}]
    )
    m1 = CP.export_corpus(
        out, {"format": "jsonl", "out_dir": str(tmp_path / "jl")}
    )
    assert m1["total_rows"] == out.count()
    m2 = CP.export_corpus(
        out,
        {
            "format": "webdataset",
            "out_dir": str(tmp_path / "wd"),
            "columns": {"text": "txt"},
            "n_shards": 2,
        },
    )
    assert m2["total_samples"] == out.count()
    from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    m3 = CP.export_corpus(
        out, {"format": "shards", "warehouse": wh, "table": "corp"}
    )
    assert m3["total_rows"] == out.count()
    with pytest.raises(ValueError, match="export format"):
        CP.export_corpus(out, {"format": "nope"})


def test_required_params_fail_before_any_spark_work(spark, docs):
    """The r16 review finding: missing required params must refuse at
    validate time, not after earlier stages' count jobs ran."""
    for spec, msg in [
        ([{"op": "quality"}, {"op": "decontam"}], "needs 'ref'"),
        ([{"op": "sample"}], "needs 'rate'"),
        ([{"op": "model_quality"}], "needs 'classifier'"),
        (
            [{"op": "model_quality", "classifier": {}, "min_prob": 0.5,
              "pareto_alpha": 9.0}],
            "exactly one of",
        ),
        ([{"op": "near_dedup", "method": "magic"}], "not in minhash"),
    ]:
        with pytest.raises(ValueError, match=msg):
            CP.validate_spec(spec)


def test_export_refuses_unknown_and_missing_params(spark, docs, tmp_path):
    out = docs.limit(5)
    with pytest.raises(ValueError, match="unknown params"):
        CP.export_corpus(
            out, {"format": "jsonl", "out_dir": str(tmp_path), "max_records": 5}
        )
    with pytest.raises(ValueError, match="missing params"):
        CP.export_corpus(out, {"format": "webdataset", "out_dir": str(tmp_path)})
    # a sink-supported key now actually reaches the sink
    m = CP.export_corpus(
        out,
        {
            "format": "jsonl",
            "out_dir": str(tmp_path / "j2"),
            "shuffle_by": ["doc_id"],
            "max_records_per_file": 2,
        },
    )
    assert m["total_rows"] == 5


def test_repetition_refuses_ambiguous_doc_id(spark, docs):
    df = docs.withColumnRenamed("doc_id", "id").withColumn(
        "doc_id", F.lit(0)
    )
    with pytest.raises(ValueError, match="ambiguous"):
        CP.run_corpus_pipeline(
            spark, df, [{"op": "repetition"}], id_col="id"
        )


def test_terminal_chunk_pack_tail(spark, docs):
    """The full training tail: filters -> chunk -> pack, one spec; the
    packed output equals the hand-composed chain."""
    spec = [
        {"op": "quality", "min_quality": 0.5},
        {"op": "chunk", "chunk_size": 32, "overlap": 4},
        {"op": "pack", "budget": 128, "n_shards": 4},
    ]
    got = CP.run_corpus_pipeline(spark, docs, spec)
    kept = text_analysis.quality_filter(docs, min_quality=0.5)
    want = text_analysis.pack_chunks(
        text_analysis.chunk_tokens(kept, chunk_size=32, overlap=4),
        budget=128,
        n_shards=4,
    )
    key = ["doc_id", "chunk_id"]
    a = {tuple(r) for r in got.select(*key, "shard", "pack_id", "pack_pos").collect()}
    b = {tuple(r) for r in want.select(*key, "shard", "pack_id", "pack_pos").collect()}
    assert a == b and a


def test_terminal_order_enforced(spark, docs):
    with pytest.raises(ValueError, match="must be the spec's tail"):
        CP.validate_spec(
            [{"op": "chunk"}, {"op": "sample", "rate": 0.5}]
        )
    with pytest.raises(ValueError, match="must run in order"):
        CP.validate_spec([{"op": "pack"}])
    with pytest.raises(ValueError, match="must run in order"):
        CP.validate_spec([{"op": "pack"}, {"op": "chunk"}])


def test_chunk_pack_webdataset_round_trip(spark, docs, tmp_path):
    """E2E training tail: a spec ending chunk->pack feeds export_corpus
    (format=webdataset) with text + json-meta + binary modality columns
    per packed chunk, and read_webdataset reassembles every sample
    BYTE-identically — the loader sees exactly what the pipeline
    computed."""
    from example_dms_dataexport_spark.sources import webdataset as WDS

    head = [
        {"op": "quality", "min_quality": 0.4},
        {"op": "exact_dedup"},
        {"op": "chunk", "chunk_size": 32, "overlap": 0},
    ]
    chunks = CP.run_corpus_pipeline(spark, docs, head)
    packed = CP.run_corpus_pipeline(
        spark, docs, head + [{"op": "pack", "budget": 128, "n_shards": 4}]
    )
    # pack_chunks emits the ASSIGNMENT relation (it deliberately drops
    # chunk_text — a packed manifest is metadata, not a text copy), so
    # the export joins it back to the chunk text on the chunk key.
    # One sample per packed chunk: a composite key (chunk grain has
    # many rows per doc_id), the chunk text, the pack assignment as
    # json sidecar, and a binary modality stand-in
    samples = packed.join(
        chunks.select("doc_id", "chunk_id", "chunk_text"),
        ["doc_id", "chunk_id"],
    ).select(
        F.format_string(
            "%d-%04d", F.col("doc_id"), F.col("chunk_id")
        ).alias("sample_id"),
        F.col("chunk_text").alias("text"),
        F.struct("shard", "pack_id", "pack_pos", "n_tokens").alias("meta"),
        F.encode(F.reverse("chunk_text"), "utf-8").alias("blob"),
    )
    out = str(tmp_path / "wds")
    manifest = CP.export_corpus(
        samples,
        {
            "format": "webdataset",
            "out_dir": out,
            "columns": {"text": "txt", "meta": "json", "blob": "bin"},
            "n_shards": 4,
        },
        id_col="sample_id",
    )
    assert manifest["total_samples"] == samples.count() > 0

    back = WDS.read_webdataset(spark, out)
    got = {
        r["__key"]: (bytes(r["text"]), bytes(r["meta"]), bytes(r["blob"]))
        for r in back.collect()
    }
    import json as _json

    want = {
        r["sample_id"]: (
            r["text"].encode(),
            _json.dumps(
                r["meta"].asDict(), sort_keys=True, separators=(",", ":")
            ).encode(),
            bytes(r["blob"]),
        )
        for r in samples.collect()
    }
    assert got == want


def test_perplexity_band_stage(spark, docs):
    """CCNet-style LM band: keep documents whose mean unigram logprob
    lies in [min, max] under the corpus's own model — equals the
    direct unigram_logprob filter; missing params refuse fast."""
    lp = text_analysis.unigram_logprob(docs)
    lo = lp.approxQuantile("logprob", [0.25], 0.0)[0]
    kept = CP.run_corpus_pipeline(
        spark, docs, [{"op": "perplexity", "min_logprob": lo}]
    )
    want = {
        r["doc_id"]
        for r in lp.filter(F.col("logprob") >= lo).collect()
    }
    got = {r["doc_id"] for r in kept.collect()}
    assert got == want
    assert 0 < len(got) < docs.count()
    with pytest.raises(ValueError, match="perplexity needs"):
        CP.validate_spec([{"op": "perplexity"}])


def test_frozen_lm_perplexity_equals_inline_on_its_own_corpus(spark, docs):
    """unigram_logprob_frozen(df, train_unigram_lm(df)) reproduces the
    inline corpus-LM scoring exactly (no unseen tokens, identical
    quantization), and the spec stage with 'lm' keeps the same ids."""
    lm = text_analysis.train_unigram_lm(docs)
    inline = {
        (r["doc_id"], r["n_tokens"], r["logprob"])
        for r in text_analysis.unigram_logprob(docs).collect()
    }
    frozen = {
        (r["doc_id"], r["n_tokens"], r["logprob"])
        for r in text_analysis.unigram_logprob_frozen(docs, lm).collect()
    }
    assert frozen == inline

    lo = sorted(x[2] for x in inline)[len(inline) // 4]
    a = {
        r["doc_id"]
        for r in CP.run_corpus_pipeline(
            spark, docs, [{"op": "perplexity", "min_logprob": lo}]
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in CP.run_corpus_pipeline(
            spark, docs, [{"op": "perplexity", "lm": lm, "min_logprob": lo}]
        ).collect()
    }
    assert a == b


def test_frozen_lm_floors_unseen_tokens(spark, docs):
    """New text full of out-of-corpus tokens scores at the floor —
    strictly below every seen token's logprob."""
    lm = text_analysis.train_unigram_lm(docs)
    new = spark.createDataFrame(
        [(1, "zzqx vvwk jjqz yyxw")], "doc_id long, text string"
    )
    got = text_analysis.unigram_logprob_frozen(new, lm).first()
    want = round(lm["floor"] / text_analysis.LP_SCALE, 4)
    assert got["n_tokens"] == 4
    assert got["logprob"] == pytest.approx(want, abs=1e-4)
    assert lm["floor"] < min(lm["lp"].values())
