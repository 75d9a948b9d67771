"""Unit tests for the LLM-pipeline operators.

The hash primitives get a THIRD independent implementation here (pure
Python, same constants) — the DuckDB oracle already cross-checks Spark at
the query level, and this pins the primitive semantics themselves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from example_dms_dataexport_spark.functions import texthash as TH
from example_dms_dataexport_spark.operators import dedup, multimodal, simsearch
from example_dms_dataexport_spark.sources.jdbc import jdbc_options


# --- pure-Python reference implementations ---------------------------------


def py_poly_hash(s: str) -> int:
    padded = (s[: TH.HASH_MAXLEN] + "\x01" * TH.HASH_MAXLEN)[: TH.HASH_MAXLEN]
    acc = 0
    for ch in padded:
        acc = (acc * TH.HASH_B + ord(ch)) % TH.HASH_P
    return acc


def py_minhash(text: str) -> list[int]:
    shingles = {text[i : i + TH.SHINGLE_K] for i in range(len(text) - TH.SHINGLE_K + 1)}
    hs = [py_poly_hash(s) for s in shingles]
    return [
        min((a * h + b) % TH.MINHASH_P for h in hs)
        for a, b in zip(TH.MINHASH_A, TH.MINHASH_B)
    ]


def py_simhash(text: str) -> int:
    toks = [t for t in text.lower().strip().split() if t]
    hs = [py_poly_hash(t) for t in toks]
    val = 0
    for j in range(dedup.SIMHASH_BITS):
        s = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if s > 0:
            val |= 1 << j
    return val


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different content with unrelated words here"),
    (3, "der hund und die katze sind freunde und das ist gut"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_poly_hash_matches_python(spark):
    texts = ["abc", "hello", "a" * 40, "the quick brown fox", "x"]
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", TH.poly_hash(F.col("s")).alias("h")).collect()
    }
    for t in texts:
        assert got[t] == py_poly_hash(t), t


def test_minhash_signatures_match_python(docs_df):
    rows = dedup.minhash_signatures(docs_df).collect()
    by_id = {r["doc_id"]: [r[f"mh{i}"] for i in range(TH.NUM_HASHES)] for r in rows}
    for doc_id, text in DOCS:
        assert by_id[doc_id] == py_minhash(text), doc_id


def test_simhash_matches_python(docs_df):
    rows = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df).collect()}
    for doc_id, text in DOCS:
        assert rows[doc_id] == py_simhash(text), doc_id


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other"), (7, "same")], ["doc_id", "text"]
    )
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 2]


def test_minhash_dedup_finds_near_duplicates(docs_df):
    pairs = dedup.minhash_dedup_pairs(docs_df, threshold=0.3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found  # one-word difference -> high jaccard
    assert all(p[0] < p[1] for p in found)
    # the unrelated docs never pair with anything
    assert not any(2 in p or 3 in p for p in found)


def test_dedup_clusters_chain_topology(spark):
    # A~B, B~C with A!~C: component-level dedup keeps exactly one of the
    # chain (the min id); per-pair deletion would drop both B and C.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["id_a", "id_b"],
    )
    labels = {
        r["id"]: r["cluster_id"] for r in dedup.dedup_clusters(pairs).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_dedup_clusters_long_path_converges(spark):
    # a 12-node path graph (diameter 11) — exercises multiple propagation
    # rounds, not just the 1-hop star case
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    rows = dedup.dedup_clusters(pairs).collect()
    assert {r["id"] for r in rows} == set(range(13))
    assert {r["cluster_id"] for r in rows} == {0}


def test_cluster_survivors_keeps_one_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 5, 10, 11]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    kept = {r["doc_id"] for r in dedup.cluster_survivors(docs, pairs).collect()}
    # one survivor per component (1 and 10), plus untouched doc 5
    assert kept == {1, 5, 10}


def test_dedup_clusters_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.dedup_clusters(pairs).count() == 0


@pytest.mark.slow
def test_dedup_clusters_nonconvergence_raises(spark):
    # diameter 5 > max_iter 2: returning the partial labels would silently
    # split the component — must raise instead
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # local_threshold=0 forces the iterative distributed path — the
        # driver-side union-find has no iteration budget to exhaust
        dedup.dedup_clusters(pairs, max_iter=2, local_threshold=0)


def test_ngram_jaccard_requires_min_tokens(spark):
    df = spark.createDataFrame([(0, "one two"), (1, "one two")], ["doc_id", "text"])
    # both docs have < 3 tokens -> no 3-grams -> no pairs (and no crash)
    assert dedup.ngram_jaccard_pairs(df, n=3).count() == 0


def test_word_ngrams_values(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    out = df.select(
        TH.word_ngrams(TH.tokens(F.col("text")), 2).alias("g")
    ).collect()[0]["g"]
    assert out == ["a§b", "b§c", "c§d"]


def test_dot_matches_numpy(spark):
    import numpy as np

    a = [float(i) / 7 for i in range(64)]
    b = [float(64 - i) / 11 for i in range(64)]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(simsearch.dot(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    assert got == pytest.approx(float(np.dot(a, b)), rel=1e-12)


def test_knn_ivf_stays_in_cluster(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], i % 3) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    probes = df.filter(F.col("vec_id") < 3)
    out = simsearch.knn_ivf(df, probes, k=5)
    joined = out.join(
        df.select("vec_id", F.col("label").alias("n_label")), "vec_id"
    ).join(
        df.select(
            F.col("vec_id").alias("probe_id"), F.col("label").alias("p_label")
        ),
        "probe_id",
    )
    bad = joined.filter(F.col("n_label") != F.col("p_label")).count()
    assert bad == 0
    assert out.count() > 0


def test_knn_brute_rank_is_total_order(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(25)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") == 0)
    out = simsearch.knn_brute(df, probes, k=5).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert all(r["vec_id"] != 0 for r in out)  # self excluded


@pytest.mark.slow
def test_media_decode_roundtrip(spark):
    df = spark.createDataFrame([(5, "abcd", 4)], ["doc_id", "text", "n_chars"])
    out = multimodal.decode_media(multimodal.media_from_documents(df)).collect()[0]
    assert out["n_bytes"] == 4
    assert out["mean_intensity"] == pytest.approx(
        (ord("a") + ord("b") + ord("c") + ord("d")) / 4
    )
    assert out["width"] == (4 % 64) + 16 and out["height"] == (5 % 32) + 8


def test_frame_sample_every_n(spark):
    df = spark.createDataFrame([(1, "abcdefgh", 8)], ["doc_id", "text", "n_chars"])
    out = multimodal.frame_sample(
        multimodal.media_from_documents(df), every=3
    ).collect()[0]
    assert out["frames"] == [ord("a"), ord("d"), ord("g")]
    assert out["n_frames"] == 3


_HAS_PIL = __import__("importlib").util.find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="Pillow installed: pil paths are live")
def test_resize_and_pil_codec_gate_without_pillow(spark):
    df = spark.createDataFrame([(1, "x", 1)], ["doc_id", "text", "n_chars"])
    media = multimodal.media_from_documents(df)
    with pytest.raises(NotImplementedError):
        multimodal.resize_stub(media, 8, 8)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media, codec="pil")


def _png_media_df(spark):
    """Two solid-gray PNGs of known size/intensity as a media table."""
    from io import BytesIO

    from PIL import Image

    def png(w, h, val):
        buf = BytesIO()
        Image.new("L", (w, h), val).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, bytearray(png(4, 3, 100)), ("png", 4, 3)),
        (2, bytearray(png(2, 5, 255)), ("png", 2, 5)),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, media binary, "
        "media_meta struct<format:string,width:int,height:int>",
    )


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_pil_decode_real_png(spark):
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_media(
            _png_media_df(spark), codec="pil"
        ).collect()
    }
    # dimensions and intensity come from the DECODED pixels, not metadata
    assert (out[1]["width"], out[1]["height"]) == (4, 3)
    assert out[1]["mean_intensity"] == pytest.approx(100.0)
    assert (out[2]["width"], out[2]["height"]) == (2, 5)
    assert out[2]["mean_intensity"] == pytest.approx(255.0)
    assert out[1]["n_bytes"] > 0


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_pil_resize_roundtrip(spark):
    resized = multimodal.resize(_png_media_df(spark), 8, 8)
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_media(resized, codec="pil").collect()
    }
    for doc_id, r in out.items():
        assert (r["width"], r["height"]) == (8, 8), doc_id
    # solid-color images stay solid through resize
    assert out[2]["mean_intensity"] == pytest.approx(255.0)


_HAS_AV = __import__("importlib").util.find_spec("av") is not None


@pytest.mark.skipif(_HAS_AV, reason="PyAV installed: av paths are live")
def test_av_codec_gate_without_pyav(spark):
    # Same gate contract as the Pillow pattern: the video paths raise
    # NotImplementedError at the import gate, before any Spark job runs.
    df = spark.createDataFrame([(1, "x", 1)], ["doc_id", "text", "n_chars"])
    media = multimodal.media_from_documents(df)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media, codec="av")
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(media, every=2, codec="av")


def _mp4_media_df(spark, n_frames=9, w=16, h=8):
    """One tiny generated mpeg4 video of solid gray frames whose
    luminance ramps 50, 60, 70, ... — frame index recoverable from the
    sampled mean."""
    from io import BytesIO

    import av
    import numpy as np

    buf = BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height = w, h
        stream.pix_fmt = "yuv420p"
        for i in range(n_frames):
            arr = np.full((h, w), 50 + 10 * i, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="gray")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    return spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), ("mp4", w, h))],
        "doc_id long, media binary, "
        "media_meta struct<format:string,width:int,height:int>",
    )


@pytest.mark.skipif(not _HAS_AV, reason="PyAV not installed")
def test_av_decode_real_video(spark):
    out = multimodal.decode_media(_mp4_media_df(spark), codec="av").collect()[0]
    # dimensions come from the DECODED stream; intensity from frame 0
    assert (out["width"], out["height"]) == (16, 8)
    assert out["mean_intensity"] == pytest.approx(50.0, abs=3.0)  # lossy codec
    assert out["n_bytes"] > 0


@pytest.mark.skipif(not _HAS_AV, reason="PyAV not installed")
def test_av_frame_sample_every_n(spark):
    out = multimodal.frame_sample(
        _mp4_media_df(spark, n_frames=9), every=3, codec="av"
    ).collect()[0]
    # frames 0, 3, 6 -> luminance ~50, ~80, ~110 (lossy-codec tolerance)
    assert out["n_frames"] == 3
    for got, want in zip(out["frames"], [50, 80, 110]):
        assert abs(got - want) <= 3


def test_jdbc_options_validation():
    opts = jdbc_options(
        url="jdbc:postgresql://host/db",
        table="public.orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "16"
    with pytest.raises(ValueError, match="needs partitionColumn"):
        jdbc_options(url="u", table="t", partition_column="c")
    with pytest.raises(ValueError, match="not both"):
        jdbc_options(url="u", table="t", query="SELECT 1")


def test_decontaminate_flags_overlapping_doc(spark):
    from example_dms_dataexport_spark.operators import decontam

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris obviously")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            (1, "quiz answer the capital of france is paris"),  # leaks 3-grams
            (2, "a completely unrelated training document here"),
        ],
        ["doc_id", "text"],
    )
    overlap = {r["doc_id"]: r["n_shared"] for r in
               decontam.ngram_overlap(docs, bench, n=3).collect()}
    assert 1 in overlap and overlap[1] >= 3
    assert 2 not in overlap
    clean = {r["doc_id"] for r in decontam.decontaminate(docs, bench).collect()}
    assert clean == {2}


def test_hash_sample_deterministic_and_nested(spark):
    from example_dms_dataexport_spark.operators import sampling

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    s10a = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.10).collect()}
    s10b = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.10).collect()}
    s05 = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.05).collect()}
    assert s10a == s10b  # reproducible
    assert s05 <= s10a  # dialing the rate up extends, never reshuffles
    assert 100 < len(s10a) < 320  # ~10% of 2000, loose tolerance


def test_stratified_sample_rates_per_stratum(spark):
    from example_dms_dataexport_spark.operators import sampling

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    out = sampling.stratified_sample(
        df, {"s0": 0.9, "s1": 0.1}, 0.5
    ).groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in out}
    assert 800 < counts["s0"] <= 1000
    assert 40 < counts["s1"] < 200
    assert 380 < counts["s2"] < 620


def test_chunk_tokens_overlap_and_tail(spark):
    from example_dms_dataexport_spark.operators import text_analysis

    # 10 tokens, chunk 4, overlap 2 -> starts 1,3,5,7 (start 9 adds nothing
    # beyond overlap); last chunk is full here, tail covered by start 7
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, ""), (3, "a b")],
        ["doc_id", "text"],
    )
    rows = text_analysis.chunk_tokens(df, chunk_size=4, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc  # empty doc emits nothing
    assert [(r["chunk_id"], r["chunk_text"], r["n_tokens"])
            for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])] == [
        (0, "a b", 2)
    ]
    got = [(r["chunk_id"], r["chunk_text"], r["n_tokens"])
           for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])]
    assert got == [
        (0, "t1 t2 t3 t4", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t5 t6 t7 t8", 4),
        (3, "t7 t8 t9 t10", 4),
    ]
    with pytest.raises(ValueError):
        text_analysis.chunk_tokens(df, chunk_size=4, overlap=4)


def test_line_dedup_drops_frequent_preserves_order(spark):
    from example_dms_dataexport_spark.operators import lines

    boiler = "subscribe now"
    docs = [
        (1, f"alpha one\n{boiler}\nalpha two"),
        (2, f"{boiler}\nbeta one"),
        (3, f"gamma one\n{boiler}"),
        (4, boiler),  # every line is boilerplate
        (5, "delta one\ndelta two"),
        (6, "shared twice\nepsilon"),
        (7, "shared twice\nzeta"),  # 2 docs == max_docs -> kept
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in lines.remove_boilerplate_lines(df, max_docs=2).collect()
    }
    assert len(out) == 7  # emptied docs survive as rows
    assert out[1]["clean_text"] == "alpha one\nalpha two"  # order kept
    assert (out[1]["n_lines"], out[1]["n_lines_kept"]) == (3, 2)
    assert out[4]["clean_text"] == "" and out[4]["n_lines_kept"] == 0
    assert out[5]["clean_text"] == "delta one\ndelta two"
    # exactly at the threshold is NOT boilerplate
    assert out[6]["clean_text"].startswith("shared twice")
    assert out[7]["clean_text"].startswith("shared twice")


def test_line_dedup_regex_metachar_separator(spark):
    # sep is a LITERAL for callers and the DuckDB oracle; '.' or '|' must
    # not be interpreted as a Java regex by F.split
    from example_dms_dataexport_spark.operators import lines

    docs = [
        (1, "alpha|common|beta"),
        (2, "common|gamma"),
        (3, "common|delta"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in lines.remove_boilerplate_lines(df, sep="|", max_docs=2).collect()
    }
    assert out[1]["n_lines"] == 3  # not len("alpha|common|beta")+1
    assert out[1]["clean_text"] == "alpha|beta"
    assert out[2]["clean_text"] == "gamma"


def test_quality_audit_empty_input_zero_counts(spark):
    from example_dms_dataexport_spark.quality import audit

    empty = spark.createDataFrame([], "k long, v double")
    out = {
        r["rule"]: r["n_violations"]
        for r in audit(
            empty,
            not_null=["v"],
            unique=[["k"]],
            predicates={"v_positive": F.col("v") > 0},
        ).collect()
    }
    # (rule, count) contract: every declared rule reports 0, never NULL
    assert out["unique:k"] == 0
    assert all(v == 0 for v in out.values())


def test_unigram_logprob_matches_python(spark):
    import math

    from example_dms_dataexport_spark.operators import text_analysis as TA

    docs = [(1, "a a b"), (2, "b c"), (3, "a c c d")]
    toks = {i: t.split() for i, t in docs}
    tf = {}
    for ts in toks.values():
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
    total = sum(tf.values())
    lp = {
        t: math.floor(math.log10(c / total) * TA.LP_SCALE + 0.5)
        for t, c in tf.items()
    }
    expect = {
        i: math.floor(
            sum(lp[t] for t in ts) / len(ts) / TA.LP_SCALE * 1e4 + 0.5
        )
        / 1e4
        for i, ts in toks.items()
    }
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TA.unigram_logprob(df).collect()}
    assert {i: r["n_tokens"] for i, r in out.items()} == {1: 3, 2: 2, 3: 4}
    assert {i: r["logprob"] for i, r in out.items()} == expect


def test_update_rollup_moves_empties_and_creates_groups(spark):
    from example_dms_dataexport_spark.operators import incremental

    fact = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], ["grp", "v"]
    )
    start = incremental.rollup(fact, ["grp"], ["v"])
    changes = spark.createDataFrame(
        [
            # U moving a row a -> b, value 20 -> 25
            ("U", "a", 20, "b", 25),
            # D emptying group c
            ("D", "c", 7, None, None),
            # I creating group d
            ("I", None, None, "d", 100),
        ],
        ["op", "before_grp", "before_v", "after_grp", "after_v"],
    )
    out = {
        r["grp"]: (r["sum_v"], r["n_rows"])
        for r in incremental.update_rollup(
            start, changes, ["grp"], ["v"]
        ).collect()
    }
    assert out == {"a": (10, 1), "b": (30, 2), "d": (100, 1)}  # c gone
    # parity with a full recompute of the merged snapshot
    snapshot = spark.createDataFrame(
        [("a", 10), ("b", 25), ("b", 5), ("d", 100)], ["grp", "v"]
    )
    full = {
        r["grp"]: (r["sum_v"], r["n_rows"])
        for r in incremental.rollup(snapshot, ["grp"], ["v"]).collect()
    }
    assert out == full


def test_pack_chunks_budget_and_offsets(spark):
    from example_dms_dataexport_spark.operators import text_analysis as TA

    # single shard so the packing order is fully deterministic
    chunks = spark.createDataFrame(
        [(1, 0, 60), (1, 1, 60), (2, 0, 60), (3, 0, 40), (4, 0, 30)],
        ["doc_id", "chunk_id", "n_tokens"],
    )
    out = TA.pack_chunks(chunks, budget=100, n_shards=1)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["pack_id"], r["pack_pos"])
        for r in out.collect()
    )
    # order (doc,chunk): starts 0,60,120,180,220 -> packs 0,0,1,1,2
    assert rows == [
        (1, 0, 0, 0),
        (1, 1, 0, 60),
        (2, 0, 1, 20),
        (3, 0, 1, 80),
        (4, 0, 2, 20),
    ]
    # sharded: every chunk of one doc stays in one shard
    out8 = TA.pack_chunks(chunks, budget=100, n_shards=8)
    shards = {
        (r["doc_id"], r["shard"]) for r in out8.select("doc_id", "shard").collect()
    }
    assert len({d for d, _ in shards}) == len(shards)


def test_duplicate_spans_merge_and_boundaries(spark):
    # docs 1 and 2 share two overlapping 3-runs ("b c d e") and a separate
    # run at the end of doc 1; doc 3 shares nothing
    df = spark.createDataFrame(
        [
            (1, "a b c d e x y z p q r"),
            (2, "m b c d e n o k p q r"),
            (3, "entirely unrelated words only here"),
        ],
        ["doc_id", "text"],
    )
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in dedup.duplicate_spans(df, window=3).collect()
    )
    # "b c d e" = windows at pos 2,3 -> one span [2,5]; "p q r" at 9..11
    assert out == [
        (1, 2, 5, 2),
        (1, 9, 11, 1),
        (2, 2, 5, 2),
        (2, 9, 11, 1),
    ]
    # short docs (< window tokens) emit nothing and don't crash
    short = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    assert dedup.duplicate_spans(short, window=3).count() == 0


def test_tfidf_top_terms_ranking(spark):
    import math

    from example_dms_dataexport_spark.operators import text_analysis as TA

    # "rare" appears only in doc 1 (idf high); "common" in all docs (idf 0)
    df = spark.createDataFrame(
        [
            (1, "rare rare common x"),
            (2, "common y y"),
            (3, "common z"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["rank"]): (r["tok"], r["tf"], r["tfidf"])
        for r in TA.tfidf_top_terms(df, k=2).collect()
    }
    idf3 = math.floor(math.log10(3) * TA.LP_SCALE + 0.5)  # df=1 -> log10(3)
    exp_rare = math.floor(2 * idf3 / TA.LP_SCALE * 1e4 + 0.5) / 1e4
    assert out[(1, 1)] == ("rare", 2, exp_rare)
    assert out[(1, 2)][0] == "x"
    # idf of "common" is log10(3/3)=0 -> score 0 regardless of tf
    assert out[(2, 1)][0] == "y"
    assert out[(3, 2)] == ("common", 1, 0.0)


def test_range_join_boundaries_and_extra_on(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 10.0), (3, "b", 10.0), (4, "a", 25.0),
         (5, "a", -3.0)],
        ["lid", "grp", "p"],
    )
    right = spark.createDataFrame(
        [(100, "a", 5.0, 10.0),   # [5,10): contains p=5, not p=10
         (200, "a", 10.0, 30.0),  # [10,30): contains 10 and 25
         (300, "b", 0.0, 20.0),   # other group
         (400, "a", 7.0, 7.0),    # empty interval matches nothing
         (500, "a", -10.0, 0.0)], # negative range: contains -3
        ["rid", "rgrp", "lo", "hi"],
    )
    # no equi key: group is ignored, buckets much smaller than ranges
    out = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            left, right.drop("rgrp"), "p", "lo", "hi", bucket_width=3.0
        ).collect()
    )
    assert out == [(1, 100), (1, 300), (2, 200), (2, 300), (3, 200),
                   (3, 300), (4, 200), (5, 500)]
    # with extra_on the b-side row only matches the b-group interval
    out2 = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            left,
            right.withColumnRenamed("rgrp", "grp"),
            "p", "lo", "hi", bucket_width=100.0, extra_on=["grp"],
        ).collect()
    )
    assert out2 == [(1, 100), (2, 200), (3, 300), (4, 200), (5, 500)]
    with _pytest.raises(ValueError, match="bucket_width"):
        range_join(left, right.drop("rgrp"), "p", "lo", "hi", bucket_width=0)
    with _pytest.raises(ValueError, match="collision"):
        range_join(left, right.withColumnRenamed("rid", "lid"),
                   "p", "lo", "hi", bucket_width=1.0)


def test_mixture_sample_caps_and_drops(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators import sampling

    # stratum "tiny" is smaller than its target -> keeps ALL rows (capped,
    # never oversampled); "big" is cut down; unweighted "other" drops
    rows = [(i, "big") for i in range(400)] + \
           [(i + 1000, "tiny") for i in range(3)] + \
           [(i + 2000, "other") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.mixture_sample(df, {"big": 1, "tiny": 1}, budget=100)
    got = {s: n for s, n in out.groupBy("source").count().collect()}
    assert got.get("tiny") == 3
    assert "other" not in got
    # big's target is 50 of 400 (12.5%); hash uniformity keeps it near 50
    assert 25 <= got["big"] <= 75, got
    # nested-sample property holds per stratum: halving the budget keeps a
    # subset of the kept ids
    half = sampling.mixture_sample(df, {"big": 1, "tiny": 1}, budget=50)
    kept_full = {r["doc_id"] for r in out.collect()}
    kept_half = {r["doc_id"] for r in half.collect()}
    assert kept_half <= kept_full
    with _pytest.raises(ValueError):
        sampling.mixture_sample(df, {}, budget=10)
    with _pytest.raises(ValueError):
        sampling.mixture_sample(df, {"big": -1}, budget=10)


def test_profile_stats_types_and_nulls(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.plans import profile

    df = spark.createDataFrame(
        [(1, "a", 2.5, None), (2, None, -1.25, None), (2, "b", None, None)],
        "k long, s string, v double, dead string",
    )
    out = {r["col_name"]: r for r in profile(df).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
    assert out["k"]["ndv"] == 2
    assert (out["k"]["min_num"], out["k"]["max_num"]) == (1.0, 2.0)
    assert out["k"]["min_str"] is None
    assert out["s"]["n_nulls"] == 1 and out["s"]["ndv"] == 2
    assert (out["s"]["min_str"], out["s"]["max_str"]) == ("a", "b")
    assert out["v"]["min_num"] == -1.25 and out["v"]["max_num"] == 2.5
    assert out["dead"]["ndv"] == 0 and out["dead"]["n_nulls"] == 3
    # approx mode still returns plausible NDV without the Expand
    appr = {r["col_name"]: r for r in profile(df, approx=True).collect()}
    assert appr["k"]["ndv"] >= 1
    with _pytest.raises(ValueError, match="unknown"):
        profile(df, ["nope"])


def test_kmeans_separates_clear_clusters(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators import kmeans as KM

    # three tight blobs along one axis, 4-dim vectors; seeds 0,1 start in
    # blob A so convergence must move a centroid out
    def vec(base, j):
        return [base + j * 0.01, base, 0.0, 0.0]

    rows = (
        [(i, vec(0.0, i)) for i in range(4)]
        + [(10 + i, vec(5.0, i)) for i in range(4)]
        + [(20 + i, vec(9.0, i)) for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = KM.kmeans_assign(df, k=2, iters=3, dim=4).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] // 10)
    # blob 0 alone in one cluster; blobs at 5.0 and 9.0 share the other
    assert sorted(map(sorted, by_cluster.values())) == [[0], [1, 2]]
    assert all(r["dist"] >= 0 for r in out)
    with _pytest.raises(ValueError):
        KM.kmeans_assign(df, k=0)


def test_equi_width_histogram_edges(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.plans import stats

    df = spark.createDataFrame(
        [(0.0,), (1.0,), (4.9,), (5.0,), (10.0,), (None,)], "x double"
    )
    out = {r["bucket"]: r for r in stats.equi_width_histogram(df, "x", k=2).collect()}
    # [0,5) and [5,10]; max lands in the last bucket via the clamp
    assert out[0]["n_rows"] == 3 and out[1]["n_rows"] == 2
    assert (out[0]["lo"], out[0]["hi"]) == (0.0, 5.0)
    assert (out[1]["lo"], out[1]["hi"]) == (5.0, 10.0)
    # all-equal column: everything in bucket 0, no div-by-zero
    same = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    s = stats.equi_width_histogram(same, "x", k=4).collect()
    assert len(s) == 1 and s[0]["bucket"] == 0 and s[0]["n_rows"] == 2
    with _pytest.raises(ValueError):
        stats.equi_width_histogram(df, "x", k=0)


def test_funnel_strict_order_and_breaks(spark):
    from datetime import datetime as DT

    import pytest as _pytest

    from example_dms_dataexport_spark.operators.funnel import funnel

    t = lambda s: DT(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 completes all three in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE click -> funnel stops at click
        (2, t(1), "view"), (2, t(3), "click"), (2, t(2), "purchase"),
        # u3: click at the same instant as view -> strictly-after fails
        (3, t(5), "view"), (3, t(5), "click"),
        # u4 never views -> absent entirely
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in
           funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["stage"] == 3 and out[1]["t3"] == t(3)
    assert out[2]["stage"] == 2 and out[2]["t3"] is None
    assert out[3]["stage"] == 1 and out[3]["t2"] is None
    with _pytest.raises(ValueError):
        funnel(df, [])


def test_resample_ffill_grid_and_carry(spark):
    from datetime import datetime as DT

    from example_dms_dataexport_spark.operators.timeseries import resample_ffill

    rows = [
        (1, DT(2024, 1, 1, 5, 30), 10.0),   # grid starts at day-trunc 00:00
        (1, DT(2024, 1, 1, 17, 0), 20.0),   # exactly on a grid point
        (1, DT(2024, 1, 2, 2, 0), 30.0),
        (2, DT(2024, 1, 1, 0, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r["user_id"], r["grid_ts"]): (r["obs_ts"], r["value"])
        for r in resample_ffill(df, "6 hours").collect()
    }
    # u1 grid: 00:00 (no obs yet -> dropped), 06:00, 12:00, 18:00, 00:00+1d
    u1 = sorted(k[1] for k in out if k[0] == 1)
    assert u1 == [DT(2024, 1, 1, 6), DT(2024, 1, 1, 12), DT(2024, 1, 1, 18),
                  DT(2024, 1, 2, 0)]
    assert out[(1, DT(2024, 1, 1, 6))] == (DT(2024, 1, 1, 5, 30), 10.0)
    # 18:00 carries the 17:00 observation (at-or-before, inclusive)
    assert out[(1, DT(2024, 1, 1, 18))] == (DT(2024, 1, 1, 17), 20.0)
    assert out[(1, DT(2024, 1, 2, 0))] == (DT(2024, 1, 1, 17), 20.0)
    # u2's single event sits exactly on its first grid point -> ties match
    assert out[(2, DT(2024, 1, 1, 0))] == (DT(2024, 1, 1, 0), 5.0)


def test_read_jsonl_explicit_schema_and_quarantine(spark, tmp_path):
    import pytest as _pytest

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from example_dms_dataexport_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "extra": true}\n'
        '{"doc_id": 2, "text": "zwei"}\n'
        "this is not json\n"
        '{"doc_id": "NaN-ish", "text": 3}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    ok = read_jsonl(spark, str(p), schema)
    rows = {r["doc_id"]: r["text"] for r in ok.collect()}
    # undeclared fields are pruned, declared ones parsed; type-mismatched
    # and unparsable lines are dropped
    assert rows == {1: "hello world", 2: "zwei"}
    assert ok.columns == ["doc_id", "text"]
    # quarantine mode keeps the bad lines with the raw text attached
    q = read_jsonl(spark, str(p), schema, keep_corrupt=True)
    bad = [r for r in q.collect() if r["_corrupt"] is not None]
    assert len(bad) == 2 and any("not json" in r["_corrupt"] for r in bad)
    with _pytest.raises(ValueError, match="_corrupt"):
        read_jsonl(spark, str(p), StructType([StructField("_corrupt", StringType())]))


def test_range_join_matches_naive_on_random_intervals(spark):
    import random

    from example_dms_dataexport_spark.operators.rangejoin import range_join

    rng = random.Random(123)
    pts = [(i, rng.uniform(-50.0, 150.0)) for i in range(300)]
    ivs = []
    for j in range(60):
        lo = rng.uniform(-60.0, 140.0)
        ivs.append((1000 + j, lo, lo + rng.uniform(0.0, 25.0)))
    left = spark.createDataFrame(pts, ["lid", "p"])
    right = spark.createDataFrame(ivs, ["rid", "lo", "hi"])
    naive = {
        (lid, rid)
        for lid, p in pts
        for rid, lo, hi in ivs
        if lo <= p < hi
    }
    # equivalence must hold for any bucket width, including widths far
    # smaller and far larger than the interval lengths
    for w in (0.7, 5.0, 400.0):
        got = {
            (r["lid"], r["rid"])
            for r in range_join(left, right, "p", "lo", "hi", bucket_width=w).collect()
        }
        assert got == naive, f"width {w}"


def test_incremental_neardup_equals_full_recompute(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely different content with unrelated words here"),
            (10, "the quick brown fox jumps over the lazy dot"),
            (11, "completely different content with unrelated words there"),
            (12, "fresh new material sharing nothing with anyone at all"),
        ],
        ["doc_id", "text"],
    )
    store_df = docs.filter(F.col("doc_id") < 10)
    batch = docs.filter(F.col("doc_id") >= 10)
    sets, sigs = dedup.corpus_signatures(store_df)
    incr = {
        (r["id_a"], r["id_b"])
        for r in dedup.incremental_dedup_pairs(
            batch, sets, sigs, threshold=0.3
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.3).collect()
    }
    touched = {p for p in full if p[0] >= 10 or p[1] >= 10}
    assert incr == touched
    # sanity: the batch really does pair across the store boundary
    assert any(a < 10 <= b for a, b in incr)


def test_quality_audit_counts_violations(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.quality import audit

    child = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 10, -2.0),      # dup key 1; negative value
            (2, 99, None),                     # orphan FK; NULL value
            (3, None, 1.0),                    # NULL FK (not an orphan)
        ],
        "k long, fk long, v double",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    out = {
        r["rule"]: r["n_violations"]
        for r in audit(
            child,
            not_null=["fk"],
            unique=[["k"]],
            predicates={"v_positive": F.col("v") > 0},
            foreign_keys=[(["fk"], parent, ["pk"])],
        ).collect()
    }
    assert out == {
        "not_null:fk": 1,
        # v <= 0 or NULL: -2.0 and the NULL both violate
        "predicate:v_positive": 2,
        "unique:k": 1,
        "fk:fk->pk": 1,  # fk=99; the NULL fk is excluded by definition
    }
    with _pytest.raises(ValueError):
        audit(child)


def test_knn_quantized_finds_clear_neighbor_and_zero_vec(spark):
    import random

    rng = random.Random(5)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x * 1.001 + 0.0005 for x in base]
    rows = [(0, base), (1, near), (99, [0.0] * 64)] + [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(2, 20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = simsearch.knn_quantized(df, df.filter(F.col("vec_id") == 0), k=3)
    top = sorted(out.collect(), key=lambda r: r["rank"])
    # int8 quantization error (~1%) cannot displace a ~parallel vector
    assert top[0]["vec_id"] == 1 and top[0]["score"] > 0.99
    # the all-zero vector (undefined cosine) is excluded entirely
    assert all(r["vec_id"] != 99 for r in top)


def test_funnel_matches_python_reference_on_random_events(spark):
    import random
    from datetime import datetime as DT, timedelta as TD

    from example_dms_dataexport_spark.operators.funnel import funnel

    rng = random.Random(77)
    t0 = DT(2024, 3, 1)
    types = ["view", "click", "purchase", "noise"]
    rows = [
        (rng.randrange(20), t0 + TD(seconds=rng.randrange(100000)),
         rng.choice(types))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["view", "click", "purchase"]

    def py_funnel():
        out = {}
        by_user: dict = {}
        for u, ts, ty in rows:
            by_user.setdefault(u, []).append((ts, ty))
        for u, evs in by_user.items():
            tks = []
            prev = None
            for s in steps:
                cand = [
                    ts for ts, ty in evs
                    if ty == s and (prev is None or ts > prev)
                ]
                if prev is None and s == steps[0] and not cand:
                    break
                t = min(cand) if cand else None
                tks.append(t)
                if t is None:
                    tks += [None] * (len(steps) - len(tks))
                    break
                prev = t
            if tks:
                out[u] = (tuple(tks), sum(1 for t in tks if t is not None))
        return out

    got = {
        r["user_id"]: ((r["t1"], r["t2"], r["t3"]), r["stage"])
        for r in funnel(df, steps).collect()
    }
    assert got == py_funnel()


def test_hll_sketch_rollup_merge_and_accuracy(spark):
    from example_dms_dataexport_spark.operators import sketches
    from example_dms_dataexport_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    daily = sketches.distinct_sketch_rollup(
        ev.select(day, "event_type", "user_id"),
        ["day", "event_type"], "user_id",
    ).persist()

    # accuracy: estimates within HLL error of the exact distinct counts
    est = {
        (r["day"], r["event_type"]): r["n_distinct"]
        for r in sketches.estimate(daily).collect()
    }
    exact = {
        (r["day"], r["event_type"]): r["x"]
        for r in ev.select(day, "event_type", "user_id").distinct()
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("x")).collect()
    }
    assert est.keys() == exact.keys()
    for k, x in exact.items():
        assert abs(est[k] - x) <= max(3, 0.05 * x), (k, est[k], x)

    # incremental maintenance: sketches built from two disjoint batches
    # and merged must estimate EXACTLY like sketches built in one pass
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = sketches.merge_rollups(
        sketches.distinct_sketch_rollup(
            b1.select(day, "event_type", "user_id"), ["day", "event_type"],
            "user_id"),
        sketches.distinct_sketch_rollup(
            b2.select(day, "event_type", "user_id"), ["day", "event_type"],
            "user_id"),
        ["day", "event_type"],
    )
    m = {
        (r["day"], r["event_type"]): r["n_distinct"]
        for r in sketches.estimate(merged).collect()
    }
    assert m == est

    # rollup to coarser grain (per event_type) without the fact table
    coarse = {
        r["event_type"]: r["n_distinct"]
        for r in sketches.estimate(
            sketches.rollup_to(daily, ["event_type"])
        ).collect()
    }
    exact_coarse = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x")).collect()
    }
    for k, x in exact_coarse.items():
        assert abs(coarse[k] - x) <= max(3, 0.05 * x)
    daily.unpersist()


def test_exact_stratified_sample_counts_and_nesting(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators import sampling

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.exact_stratified_sample(df, {"a": 50, "b": 7})
    got = {s: n for s, n in out.groupBy("source").count().collect()}
    assert got == {"a": 50, "b": 7}  # exact, not in-expectation
    # quota larger than the stratum keeps the whole stratum
    all_b = sampling.exact_stratified_sample(df, {"b": 10**6})
    assert all_b.count() == 100
    # nesting: quota 25 selects a subset of quota 50's picks
    small = {
        r["doc_id"]
        for r in sampling.exact_stratified_sample(df, {"a": 25}).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.exact_stratified_sample(df, {"a": 50}).collect()
    }
    assert small <= big and len(small) == 25
    with _pytest.raises(ValueError):
        sampling.exact_stratified_sample(df, {})


def test_scd2_collapses_noops_and_closes_intervals(spark):
    from datetime import datetime as DT

    import pytest as _pytest

    from example_dms_dataexport_spark.operators.scd import scd2_from_changes

    t = lambda s: DT(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(1), "gold", 10),
        (1, t(2), "gold", 10),    # no-op: collapses
        (1, t(3), "silver", 10),  # tier change -> new version
        (1, t(4), "silver", 20),  # second attr change -> new version
        (2, t(5), None, 1),
        (2, t(6), None, 1),       # NULL -> NULL is a no-op
        (2, t(7), "bronze", 1),   # NULL -> value is a change
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "tier", "limit_v"])
    out = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["tier"], r["limit_v"])
        for r in scd2_from_changes(
            df, ["k"], "ts", ["tier", "limit_v"]
        ).collect()
    )
    assert out == [
        (1, t(1), t(3), "gold", 10),
        (1, t(3), t(4), "silver", 10),
        (1, t(4), None, "silver", 20),
        (2, t(5), t(7), None, 1),
        (2, t(7), None, "bronze", 1),
    ]
    with _pytest.raises(ValueError):
        scd2_from_changes(df, [], "ts", ["tier"])


@pytest.mark.slow
def test_scd2_apply_delta_equals_full_rebuild(spark):
    """Delta maintenance owes an equivalence proof: folding any suffix
    batch into the prefix-built history must be row-identical to
    rebuilding from the full stream — at every split point, including
    splits that land mid-no-op-run, batches introducing brand-new keys,
    and the empty batch."""
    from datetime import datetime as DT

    from example_dms_dataexport_spark.operators.scd import (
        scd2_apply_delta,
        scd2_from_changes,
    )

    t = lambda s: DT(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(1), 100, "gold"),
        (1, t(2), 101, "gold"),     # no-op
        (1, t(3), 102, "silver"),
        (1, t(4), 103, "silver"),   # no-op
        (1, t(5), 104, "gold"),
        (2, t(2), 200, None),
        (2, t(6), 201, "bronze"),
        (3, t(7), 300, "new"),      # key first seen late (batch-only key)
        (1, t(8), 105, "gold"),     # trailing no-op
    ]
    cols = ["k", "ts", "eid", "tier"]
    full = spark.createDataFrame(rows, cols)
    key = lambda tup: tuple(str(v) for v in tup)
    rebuilt = sorted(
        (tuple(r) for r in scd2_from_changes(
            full, ["k"], "ts", ["tier"], ["eid"]
        ).collect()),
        key=key,
    )
    ordered = sorted(rows, key=lambda r: (r[1], r[2]))
    for split in range(len(rows) + 1):  # every split incl. empty batch
        prefix = spark.createDataFrame(ordered[:split], cols) if split else (
            spark.createDataFrame([], "k int, ts timestamp, eid int, tier string")
        )
        batch = (
            spark.createDataFrame(ordered[split:], cols)
            if split < len(rows)
            else spark.createDataFrame(
                [], "k int, ts timestamp, eid int, tier string"
            )
        )
        hist = scd2_from_changes(prefix, ["k"], "ts", ["tier"], ["eid"])
        out = sorted(
            (tuple(r) for r in scd2_apply_delta(
                hist, batch, ["k"], "ts", ["tier"], ["eid"]
            ).collect()),
            key=key,
        )
        assert out == rebuilt, f"split={split}"


def test_scd2_apply_delta_rejects_late_rows(spark):
    """The order guard turns late/out-of-order batch data into a loud
    runtime failure instead of a silently wrong history; equal-ts rows
    pass (they deterministically sort after the seed)."""
    import pytest as _pytest

    from example_dms_dataexport_spark.operators.scd import (
        scd2_apply_delta,
        scd2_from_changes,
    )

    schema = "k int, tier string, ts int, eid int"
    hist = scd2_from_changes(
        spark.createDataFrame([(1, "gold", 5, 100)], schema),
        ["k"], "ts", ["tier"], ["eid"],
    )
    late = spark.createDataFrame([(1, "silver", 3, 101)], schema)
    with _pytest.raises(Exception, match="older than its key's open"):
        scd2_apply_delta(hist, late, ["k"], "ts", ["tier"], ["eid"]).collect()
    # validate_order=False keeps the (documented-wrong) permissive path
    scd2_apply_delta(
        hist, late, ["k"], "ts", ["tier"], ["eid"], validate_order=False
    ).collect()
    # equal-ts batch rows pass the guard
    same_ts = spark.createDataFrame([(1, "silver", 5, 101)], schema)
    out = scd2_apply_delta(
        hist, same_ts, ["k"], "ts", ["tier"], ["eid"]
    ).collect()
    assert len(out) == 2


def test_scd2_apply_delta_validates_helper_collision(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators.scd import scd2_apply_delta

    hist = spark.createDataFrame(
        [(1, "a", None, 0)],
        "k int, tier string, valid_from timestamp, _scd2_seq int",
    )
    batch = spark.createDataFrame([(1, "b", 2)], ["k", "tier", "ts"])
    with _pytest.raises(ValueError, match="_scd2_seq"):
        scd2_apply_delta(hist, batch, ["k"], "ts", ["tier"])


def test_snapshot_diff_roundtrip_and_ops(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.merge import apply_changes
    from example_dms_dataexport_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged -> no row
            (2, "b", 20.0),   # value change -> U
            (3, "c", None),   # deleted -> D
            (4, None, 40.0),  # NULL -> value -> U
            (5, None, 50.0),  # NULL == NULL -> no row
        ],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b2", 20.0),
            (4, "x", 40.0),
            (5, None, 50.0),
            (6, "f", 60.0),   # inserted -> I
        ],
        ["k", "s", "v"],
    )
    diff = snapshot_diff(old, new, ["k"])
    got = sorted((r["op"], r["k"], r["s"], r["v"]) for r in diff.collect())
    assert got == [
        ("D", 3, "c", None),
        ("I", 6, "f", 60.0),
        ("U", 2, "b2", 20.0),
        ("U", 4, "x", 40.0),
    ]
    # Round-trip law: applying the diff to old reproduces new exactly.
    replayed = sorted(map(tuple, apply_changes(old, diff, ["k"]).collect()))
    assert replayed == sorted(map(tuple, new.collect()))
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    with _pytest.raises(ValueError):
        snapshot_diff(old, new.select("k", "v", "s"), ["k"])


def test_bloom_semi_join_exact_and_bounded_fpr(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_semi_join,
    )

    dim = spark.range(0, 900, 3).withColumnRenamed("id", "k")
    fact = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    got = sorted(map(tuple, bloom_semi_join(fact, dim, ["k"]).collect()))
    want = sorted(map(tuple, fact.join(dim, "k", "left_semi").collect()))
    assert got == want  # bloom pruning never changes the exact result

    words, m, k = bloom_build(dim, ["k"])
    # no false negatives: every member passes the membership predicate
    assert dim.filter(bloom_might_contain(words, m, k, ["k"])).count() == dim.count()
    # false-positive rate stays near the design point (8 bits/key, k<=6 ~ 2%)
    nonmem = spark.range(10_000, 30_000).withColumnRenamed("id", "k")
    fpr = nonmem.filter(bloom_might_contain(words, m, k, ["k"])).count() / 20_000
    assert fpr < 0.05
    # empty dim -> empty result, no blow-up
    assert bloom_semi_join(fact, dim.filter(F.lit(False)), ["k"]).count() == 0
    # composite keys hash as a tuple
    d2 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    f2 = spark.createDataFrame([(1, "a", 9), (1, "x", 8), (2, "b", 7)], ["k", "s", "v"])
    assert sorted(
        (r["k"], r["s"], r["v"])
        for r in bloom_semi_join(f2, d2, ["k", "s"]).collect()
    ) == [(1, "a", 9), (2, "b", 7)]
    with _pytest.raises(ValueError):
        bloom_semi_join(fact, dim, [])
    with _pytest.raises(ValueError):
        bloom_semi_join(fact, dim, ["nope"])


def _py_bpe(words, num_merges, min_count):
    """Reference BPE on a {word: count} dict, greedy left-to-right apply."""
    tbl = [([c for c in w], n) for w, n in words.items()]
    merges = []
    for _ in range(num_merges):
        pc = {}
        for syms, n in tbl:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_count:
            break
        merges.append((l, r, n))
        new_tbl = []
        for syms, cnt in tbl:
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new_tbl.append((out, cnt))
        tbl = new_tbl
    return merges


def test_bpe_train_matches_python_reference(spark):
    import pytest as _pytest

    from example_dms_dataexport_spark.operators.bpe import bpe_segment, bpe_train

    texts = [
        "low low low lower lower lowest",
        "new newer newest new new",
        "widow widow window",
        "aaa aaa banana",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    # word counts for the python reference (same tokenizer: lowercase split)
    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _py_bpe(freqs, num_merges=8, min_count=2)
    got = bpe_train(docs, num_merges=8, min_pair_count=2)
    assert got == want
    # greedy overlap rule: merging (a,a) over "aaa" -> ["aa","a"]
    seg = {
        r["w"]: list(r["syms"])
        for r in bpe_segment(docs, got).collect()
    }
    # reference segmentation: replay merges greedily per word
    for w in freqs:
        syms = list(w)
        for l, r, _ in got:
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms = out
        assert seg[w] == syms, w
    with _pytest.raises(ValueError):
        bpe_train(docs, num_merges=0)


def test_bm25_matches_pure_python(spark):
    import math

    from example_dms_dataexport_spark.operators import text_analysis as TA

    docs = [
        (1, "spark join hash join"),
        (2, "hash table scan"),
        (3, "sort merge only"),
        (4, "spark spark spark filter"),
    ]
    terms = ["spark", "join"]
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {w: sum(1 for v in toks.values() if w in v) for w in terms}
    idf6 = {
        w: math.floor(
            math.log((n - dfreq[w] + 0.5) / (dfreq[w] + 0.5) + 1.0) * 1e6 + 0.5
        )
        for w in terms
    }

    def score(i):
        dl = len(toks[i])
        t6 = 0
        for w in terms:
            tf = toks[i].count(w)
            if tf:
                t6 += math.floor(
                    idf6[w] * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                    + 0.5
                )
        return math.floor(t6 / 100.0 + 0.5) / 1e4

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in TA.bm25_scores(df, terms).collect()
    }
    assert set(got) == {1, 4}  # docs 2 and 3 contain neither term
    for i in got:
        assert got[i] == score(i), i
    # two distinct matching terms beat one term stuffed (tf saturation)
    assert got[1] > got[4]


def test_percentile_rank_matches_window(spark):
    from pyspark.sql import Window as W

    from example_dms_dataexport_spark.quality import percentile_rank

    rows = [("a", float(v)) for v in [1, 2, 2, 3]] + [("b", 7.0)]
    df = spark.createDataFrame(rows, ["grp", "val"]).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    got = {
        (r["grp"], r["val"], r["pct"])
        for r in percentile_rank(df, "grp", "val").collect()
    }
    ref = {
        (r["grp"], r["val"], r["pct"])
        for r in df.withColumn(
            "pct", F.percent_rank().over(W.partitionBy("grp").orderBy("val"))
        ).collect()
    }
    assert got == ref
    # single-row group gets 0.0, ties share the min rank
    assert ("b", 7.0, 0.0) in got
    assert ("a", 2.0, 1 / 3) in got


def test_percentile_rank_keeps_null_keys(spark):
    # NULL group/value rows must come back ranked (null-safe join), not
    # silently dropped like a plain equi-join would
    from example_dms_dataexport_spark.quality import percentile_rank

    rows = [("a", 1.0), ("a", None), (None, 5.0), (None, 6.0)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = percentile_rank(df, "grp", "val").collect()
    assert len(out) == 4
    by_key = {(r["grp"], r["val"]): r["pct"] for r in out}
    assert (None, 5.0) in by_key and (None, 6.0) in by_key
    assert ("a", None) in by_key


def test_leakage_safe_split_coassigns_near_dups(spark):
    # paired docs (same component) must land in the same split, whatever
    # the hash says about their individual ids
    from example_dms_dataexport_spark.functions import texthash as TH2

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (10, 30)], ["id_a", "id_b"]
    )
    clusters = dedup.dedup_clusters(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    key = F.coalesce(F.col("cluster_id"), F.col("doc_id")).cast("string")
    out = {
        r["doc_id"]: r["split"]
        for r in docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.when(TH2.poly_hash(key) % 100 < 90, F.lit("train"))
            .otherwise(F.lit("holdout"))
            .alias("split"),
        )
        .collect()
    }
    assert len(out) == 40
    assert out[0] == out[1] == out[2]
    assert out[5] == out[6]
    assert out[10] == out[30]


def test_bigram_logprob_matches_python_reference(spark):
    """Pin the add-one bigram model against a direct python computation
    on a corpus small enough to enumerate by hand."""
    import math
    from collections import Counter

    from example_dms_dataexport_spark.operators import text_analysis

    corpus = {1: "a b a b", 2: "a a", 3: "x"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["logprob"])
        for r in text_analysis.bigram_logprob(docs).collect()
    }

    toks = {k: v.split() for k, v in corpus.items()}
    uni = Counter(t for ts in toks.values() for t in ts)
    vocab = len(uni)
    big = {
        k: list(zip(ts, ts[1:])) for k, ts in toks.items() if len(ts) >= 2
    }
    c2 = Counter(b for bs in big.values() for b in bs)
    lp = {
        b: math.floor(
            math.log10((c2[b] + 1) / (uni[b[0]] + vocab))
            * text_analysis.LP_SCALE
            + 0.5
        )
        for b in c2
    }
    expect = {}
    for k, bs in big.items():
        s = sum(lp[b] for b in bs)
        expect[k] = (
            len(bs),
            math.floor(s / len(bs) / text_analysis.LP_SCALE * 1e4 + 0.5)
            / 1e4,
        )
    assert out == expect
    assert 3 not in out  # single-token doc has no bigrams


def test_retention_cohorts_small_fixture(spark, tmp_path):
    """u1/u2 join on day 1, u3 on day 2; retention shares computed by
    hand. The query reads events from an sf_dir, so the fixture lands as
    a parquet table."""
    import datetime as dt

    from example_dms_dataexport_spark.registry import load_all

    rows = []
    eid = 0
    for user, days in [(1, [1, 2, 3]), (2, [1, 3]), (3, [2])]:
        for d in days:
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, d, 12, 0), user, "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    qs, _ = load_all()
    out = {
        (str(r["cohort_day"]), r["day_offset"]): (
            r["n_users"],
            r["cohort_size"],
            r["retention"],
        )
        for r in qs["q89_retention_cohorts"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-01", 2): (2, 2, 1.0),
        ("2024-01-02", 0): (1, 1, 1.0),
    }


def test_rolling_active_users_small_fixture(spark, tmp_path):
    """u1 active d1,d2; u2 active d1 only: WAU covers trailing windows,
    stickiness = dau/wau, and days past the data max are trimmed."""
    import datetime as dt

    from example_dms_dataexport_spark.registry import load_all

    rows = []
    eid = 0
    for user, days in [(1, [1, 2]), (2, [1])]:
        for d in days:
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, d, 9, 0), user, "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    qs, _ = load_all()
    out = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in qs["q93_rolling_active_users"](spark, str(tmp_path)).collect()
    }
    # max data day is Jan 2 -> report days Jan 1..2 only
    assert out == {
        "2024-01-01": (2, 2, 1.0),
        "2024-01-02": (1, 2, 0.5),
    }


# ---------------------------------------------------------------------------
# round 7: histogram quantile sketch, MG heavy hitters, token-budget shards
# ---------------------------------------------------------------------------


def test_histogram_sketch_merge_equals_whole(spark):
    # merging half-sketches must produce the IDENTICAL state as sketching
    # the whole input — the mergeability contract (bin edges are fixed,
    # counts are exact, so this is equality, not approximation)
    from example_dms_dataexport_spark.operators import sketches

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 97).cast("double").alias("v")
    )
    whole = sketches.histogram_sketch(df, ["g"], "v", 0.0, 100.0, 32)
    halves = [
        sketches.histogram_sketch(
            df.filter(F.col("id") % 2 == i), ["g"], "v", 0.0, 100.0, 32
        )
        for i in (0, 1)
    ]
    merged = sketches.merge_histograms(halves[0], halves[1], ["g"])
    w = sorted(map(tuple, whole.collect()))
    m = sorted(map(tuple, merged.collect()))
    assert w == m


def test_histogram_percentile_within_one_bin(spark):
    from example_dms_dataexport_spark.operators import sketches

    df = spark.range(1, 10001).select(
        F.lit(0).alias("g"), F.col("id").cast("double").alias("v")
    )
    lo, hi, bins = 0.0, 10001.0, 64
    hist = sketches.histogram_sketch(df, ["g"], "v", lo, hi, bins)
    est = sketches.histogram_percentile(hist, ["g"], 0.5, lo, hi, bins).collect()[0]
    exact = 5000.0  # ceil(0.5 * 10000)-th of 1..10000
    step = (hi - lo) / bins
    assert 0 < est["estimate"] - exact <= step + 1e-9


def test_histogram_sketch_rejects_bad_range(spark):
    from example_dms_dataexport_spark.operators import sketches

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        sketches.histogram_sketch(df, [], "v", 5.0, 5.0)


def test_heavy_hitters_exact_on_skewed(spark):
    from example_dms_dataexport_spark.operators import freq

    # zipf-ish: item i appears 2^(10-i) times -> unambiguous top-3
    rows = [(f"w{i}",) for i in range(10) for _ in range(2 ** (10 - i))]
    df = spark.createDataFrame(rows, ["item"]).repartition(8)
    got = [tuple(r) for r in freq.heavy_hitters(df, "item", k=3).collect()]
    assert got == [("w0", 1024), ("w1", 512), ("w2", 256)]


def test_heavy_hitters_fallback_still_exact_on_flat(spark):
    from example_dms_dataexport_spark.operators import freq

    # perfectly flat data: the certificate CANNOT hold with a tiny
    # capacity, so the exact fallback must kick in and still be right
    # (ties broken by item ascending)
    rows = [(f"x{i:03d}",) for i in range(50) for _ in range(4)]
    df = spark.createDataFrame(rows, ["item"]).repartition(8)
    got = [tuple(r) for r in freq.heavy_hitters(df, "item", k=5, capacity=5).collect()]
    assert got == [(f"x{i:03d}", 4) for i in range(5)]


def test_heavy_hitters_validates_args(spark):
    from example_dms_dataexport_spark.operators import freq

    df = spark.createDataFrame([("a",)], ["item"])
    with pytest.raises(ValueError):
        freq.heavy_hitters(df, "item", k=0)
    with pytest.raises(ValueError):
        freq.heavy_hitters(df, "item", k=10, capacity=5)


def test_token_budget_shards_matches_serial_cumsum(spark):
    from example_dms_dataexport_spark.operators.sampling import (
        token_budget_shards,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), ((F.col("id") % 7) + 1).alias("w")
    ).repartition(8)
    out = {
        r["doc_id"]: r["shard_id"]
        for r in token_budget_shards(df, "doc_id", "w", 20, n_buckets=4).collect()
    }
    # serial restatement: order by (doc_id % 4, doc_id), running start // 20
    order = sorted(range(100), key=lambda i: (i % 4, i))
    start = 0
    for i in order:
        assert out[i] == start // 20, i
        start += (i % 7) + 1
    # shard ids are contiguous from 0
    assert min(out.values()) == 0
    assert set(out.values()) == set(range(max(out.values()) + 1))


def test_token_budget_shards_validates_budget(spark):
    from example_dms_dataexport_spark.operators.sampling import (
        token_budget_shards,
    )

    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(1).alias("w"))
    with pytest.raises(ValueError):
        token_budget_shards(df, "doc_id", "w", 0)


# --- WAV audio decode (the no-external-lib real modality) -------------------


def test_wav_roundtrip_decode_matches_python(spark):
    import math
    import wave
    from io import BytesIO

    rows = [(0, "hello world"), (1, ""), (2, "abc"), (7, "Zz 9!")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    wavs = multimodal.wav_from_documents(docs)
    # the payload is a conformant RIFF/WAV any stdlib reader can open
    for r in wavs.collect():
        with wave.open(BytesIO(bytes(r["media"])), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 8000 + (r["doc_id"] % 4) * 4000
    got = {
        r["doc_id"]: r for r in multimodal.decode_audio(wavs).collect()
    }
    for doc_id, text in rows:
        b = text.encode()
        r = got[doc_id]
        assert r["n_samples"] == len(b)
        assert r["sample_rate"] == 8000 + (doc_id % 4) * 4000
        assert r["sum_sq"] == sum(((x - 128) * 256) ** 2 for x in b)
        assert r["n_bytes"] == 44 + 2 * len(b)  # header + 16-bit payload
        assert not math.isnan(r["sum_sq"])


def test_resample_audio_scales_sample_count(spark):
    import wave
    from io import BytesIO

    docs = spark.createDataFrame(
        [(0, "0123456789abcdef")], ["doc_id", "text"]
    )
    wavs = multimodal.wav_from_documents(docs)  # doc 0 -> 8000 Hz, 16 samples
    out = multimodal.resample_audio(wavs, 4000).collect()[0]
    with wave.open(BytesIO(bytes(out["media"])), "rb") as w:
        assert w.getframerate() == 4000
        assert w.getnframes() == 8  # 16 * 4000/8000
    # upsampling is endpoint-preserving: first/last samples survive
    up = multimodal.resample_audio(wavs, 16000).collect()[0]
    src = multimodal.decode_audio(wavs).collect()[0]
    with wave.open(BytesIO(bytes(up["media"])), "rb") as w:
        assert w.getnframes() == 32
        import numpy as np

        res = np.frombuffer(w.readframes(32), dtype="<i2")
    text_bytes = "0123456789abcdef".encode()
    assert res[0] == (text_bytes[0] - 128) * 256
    assert res[-1] == (text_bytes[-1] - 128) * 256
    assert src["n_samples"] == 16


def test_resample_audio_validates_rate(spark):
    docs = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        multimodal.resample_audio(multimodal.wav_from_documents(docs), 0)


# --- PNM image decode (the no-external-lib real image modality) -------------


def test_pnm_roundtrip_decode_matches_python(spark):
    rows = [(0, "hello world"), (1, ""), (2, "abc"), (7, "Zz 9!"), (16, "q" * 40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_pnm(
            multimodal.pnm_from_documents(docs)
        ).collect()
    }
    for doc_id, text in rows:
        b = text.encode()
        w = (doc_id % 16) + 4
        h = max(1, -(-len(b) // w))
        r = got[doc_id]
        assert (r["format"], r["channels"]) == (
            ("P5", 1) if doc_id % 2 == 0 else ("P6", 3)
        )
        assert (r["width"], r["height"]) == (w, h)
        assert r["pix_sum"] == sum(b) * r["channels"]
        header = len(f"P{'5' if doc_id % 2 == 0 else '6'}\n{w} {h}\n255\n")
        assert r["n_bytes"] == header + w * h * r["channels"]


def test_pnm_parser_handles_comments_and_whitespace():
    from example_dms_dataexport_spark.operators.multimodal import _parse_pnm

    raw = b"P5 # binary pgm\n# a comment line\n 3\n2 # dims\n255\n" + bytes(
        range(6)
    )
    magic, w, h, c, px = _parse_pnm(raw)
    assert (magic, w, h, c) == ("P5", 3, 2, 1)
    assert list(px) == [0, 1, 2, 3, 4, 5]


def test_resize_pnm_nearest_neighbor_exact(spark):
    # doc 0 -> P5, width (0%16)+4 = 4, "abcd" -> one 4x1 row
    docs = spark.createDataFrame([(0, "abcd"), (1, "wxyz")], ["doc_id", "text"])
    pnm = multimodal.pnm_from_documents(docs)
    resized = multimodal.resize_pnm(pnm, 8, 2)
    got = {
        r["doc_id"]: r for r in multimodal.decode_pnm(resized).collect()
    }
    for doc_id, text in [(0, "abcd"), (1, "wxyz")]:
        r = got[doc_id]
        assert (r["width"], r["height"]) == (8, 2)
        # replicate the endpoint-preserving nearest-neighbor grid exactly
        w = (doc_id % 16) + 4
        src = list(text.encode()) + [0] * (w - len(text))  # zero-padded row
        xs = [min((i * w) // 8, w - 1) for i in range(8)]
        ys = [min((j * 1) // 2, 0) for j in range(2)]
        expect = sum(src[x] for _ in ys for x in xs)
        assert r["pix_sum"] == expect * r["channels"]
        assert (r["format"], r["channels"]) == (
            ("P5", 1) if doc_id % 2 == 0 else ("P6", 3)
        )
    with pytest.raises(ValueError, match="positive"):
        multimodal.resize_pnm(pnm, 0, 2)


def test_png_roundtrip_decode_matches_python(spark):
    rows = [(0, "hello world"), (1, ""), (2, "abc"), (7, "Zz 9!"), (16, "q" * 40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_png(
            multimodal.png_from_documents(docs)
        ).collect()
    }
    for doc_id, text in rows:
        b = text.encode()
        w = (doc_id % 16) + 4
        h = max(1, -(-len(b) // w))
        r = got[doc_id]
        assert (r["color_type"], r["channels"]) == (
            (0, 1) if doc_id % 2 == 0 else (2, 3)
        )
        assert (r["width"], r["height"]) == (w, h)
        assert r["pix_sum"] == sum(b) * r["channels"]
        # the fixture filters scanline r with (doc_id + r) % 5
        expect_mask = 0
        for rr in range(h):
            expect_mask |= 1 << ((doc_id + rr) % 5)
        assert r["filter_mask"] == expect_mask


def test_resize_png_nearest_neighbor_exact(spark):
    # doc 0 -> gray, width (0%16)+4 = 4, "abcd" -> one 4x1 row
    docs = spark.createDataFrame([(0, "abcd"), (1, "wxyz")], ["doc_id", "text"])
    png = multimodal.png_from_documents(docs)
    resized = multimodal.resize_png(png, 8, 2)
    got = {
        r["doc_id"]: r for r in multimodal.decode_png(resized).collect()
    }
    for doc_id, text in [(0, "abcd"), (1, "wxyz")]:
        r = got[doc_id]
        assert (r["width"], r["height"]) == (8, 2)
        w = (doc_id % 16) + 4
        src = list(text.encode()) + [0] * (w - len(text))  # zero-padded row
        xs = [min((i * w) // 8, w - 1) for i in range(8)]
        ys = [min((j * 1) // 2, 0) for j in range(2)]
        expect = sum(src[x] for _ in ys for x in xs)
        assert r["pix_sum"] == expect * r["channels"]
        assert (r["color_type"], r["channels"]) == (
            (0, 1) if doc_id % 2 == 0 else (2, 3)
        )
        assert r["filter_mask"] == 1  # re-encoded with filter 0 scanlines
    with pytest.raises(ValueError, match="positive"):
        multimodal.resize_png(png, 0, 2)


def test_pnm_parser_rejects_bad_payloads():
    from example_dms_dataexport_spark.operators.multimodal import _parse_pnm

    with pytest.raises(ValueError, match="magic"):
        _parse_pnm(b"P3\n1 1\n255\n9")  # ASCII PNM is not binary
    with pytest.raises(ValueError, match="two-byte"):
        _parse_pnm(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        _parse_pnm(b"P6\n2 2\n255\n\x00\x00\x00")


# --- KLL quantile sketch ----------------------------------------------------


def test_kll_exact_when_no_compaction(spark):
    from example_dms_dataexport_spark.operators import kll

    vals = [(i, "g", float((i * 37) % 101)) for i in range(100)]
    df = spark.createDataFrame(vals, ["id", "g", "v"]).repartition(4)
    sk = kll.kll_merge(kll.kll_sketch(df, ["g"], "v", k=512), ["g"], k=512)
    out = kll.kll_quantile(sk, 0.5, k=512).collect()[0]
    assert out["n"] == 100
    assert out["tol"] == 0  # no compaction ever fired
    exact = sorted(v for _, _, v in vals)[49]  # ceil(0.5*100) = rank 50
    assert out["estimate"] == exact


def test_kll_certificate_holds_under_compaction_and_merge(spark):
    from example_dms_dataexport_spark.operators import kll

    n = 5000
    vals = [(i, f"g{i % 3}", float((i * 7919) % 9973)) for i in range(n)]
    df = spark.createDataFrame(vals, ["id", "g", "v"]).repartition(8)
    halves = [
        kll.kll_sketch(df.filter(F.col("id") % 2 == i), ["g"], "v", k=64)
        for i in (0, 1)
    ]
    sk = kll.kll_merge(halves[0].unionByName(halves[1]), ["g"], k=64)
    for q in (0.1, 0.5, 0.95):
        for row in kll.kll_quantile(sk, q, k=64).collect():
            grp = sorted(v for _, g, v in vals if g == row["g"])
            assert row["n"] == len(grp)  # exact weight conservation
            assert row["tol"] > 0  # compactions really fired at k=64
            target = -(-q * len(grp) // 1)
            lt = sum(1 for v in grp if v < row["estimate"])
            le = sum(1 for v in grp if v <= row["estimate"])
            assert lt < target + row["tol"], (q, row)
            assert le >= target - row["tol"], (q, row)
            # the certificate is also TIGHT enough to be useful
            assert row["tol"] < len(grp) * 0.15, (q, row)


def test_kll_deterministic_across_runs(spark):
    from example_dms_dataexport_spark.operators import kll

    df = spark.range(2000).select(
        F.lit("g").alias("g"), (F.col("id") * 31 % 997).cast("double").alias("v")
    ).repartition(4, "v")
    def build():
        sk = kll.kll_merge(kll.kll_sketch(df, ["g"], "v", k=32), ["g"], k=32)
        return kll.kll_quantile(sk, 0.9, k=32).collect()[0]
    a, b = build(), build()
    assert (a["estimate"], a["tol"], a["n"]) == (b["estimate"], b["tol"], b["n"])


def test_kll_validates_q(spark):
    from example_dms_dataexport_spark.operators import kll

    df = spark.createDataFrame([(1, "g", 1.0)], ["id", "g", "v"])
    sk = kll.kll_sketch(df, ["g"], "v")
    with pytest.raises(ValueError, match="q must be"):
        kll.kll_quantile(sk, 0.0)


# --- count-min sketch -------------------------------------------------------


def test_cms_merge_equals_whole(spark):
    from example_dms_dataexport_spark.operators import freq

    items = [(i, f"t{i % 7}") for i in range(200)] + [(200, "rare")]
    df = spark.createDataFrame(items, ["i", "item"])
    a, b = df.filter(F.col("i") < 100), df.filter(F.col("i") >= 100)
    whole = freq.cms_sketch(df, "item", depth=3, width=64)
    merged = freq.merge_cms(
        freq.cms_sketch(a, "item", depth=3, width=64),
        freq.cms_sketch(b, "item", depth=3, width=64),
    )
    w = {(r["d"], r["slot"]): r["n"] for r in whole.collect()}
    m = {(r["d"], r["slot"]): r["n"] for r in merged.collect()}
    assert w == m


def test_cms_estimate_never_undercounts(spark):
    from example_dms_dataexport_spark.operators import freq

    items = [(f"w{i % 13}",) for i in range(500)]
    df = spark.createDataFrame(items, ["item"])
    state = freq.cms_sketch(df, "item", depth=4, width=32)  # tiny: collisions
    probes = df.distinct()
    est = {
        r["item"]: r["est_n"]
        for r in freq.cms_lookup(state, probes, "item", depth=4, width=32).collect()
    }
    true = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for item, n in true.items():
        assert est[item] >= n, item


def test_cms_validates_args(spark):
    from example_dms_dataexport_spark.operators import freq

    df = spark.createDataFrame([("a",)], ["item"])
    with pytest.raises(ValueError):
        freq.cms_sketch(df, "item", depth=0)


# --- per-group cap (domain capping) ----------------------------------------


def test_cap_per_group_matches_plain_window(spark):
    from example_dms_dataexport_spark.operators import sampling

    rows = [
        (i, f"s{i % 3}", float((i * 37) % 11))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"]).repartition(6)
    order = [("quality", "desc"), ("doc_id", "asc")]
    pruned = sampling.cap_per_group(df, "source", order, 5, preprune=True)
    plain = sampling.cap_per_group(df, "source", order, 5, preprune=False)
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(map(key, pruned.collect())) == sorted(map(key, plain.collect()))
    per_src = {}
    for r in pruned.collect():
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert all(v == 5 for v in per_src.values())


def test_cap_per_group_validates_k(spark):
    from example_dms_dataexport_spark.operators import sampling

    df = spark.createDataFrame([(1, "a", 0.5)], ["doc_id", "source", "quality"])
    with pytest.raises(ValueError):
        sampling.cap_per_group(df, "source", [("quality", "desc")], 0)


# ---------------------------------------------------------------------------
# global ordering (operators/ordering.py)
# ---------------------------------------------------------------------------


def test_global_index_matches_global_rank(spark):
    from example_dms_dataexport_spark.operators import ordering

    df = spark.range(0, 997).select(
        F.col("id"), (F.col("id") * 7919 % 997).alias("k")
    )
    out = ordering.global_index(df, [F.col("k"), F.col("id")], num_partitions=8)
    rows = out.orderBy("idx").collect()
    assert [r["idx"] for r in rows] == list(range(997))
    # idx equals the rank under the strict (k, id) order
    expect = sorted(((r["k"], r["id"]) for r in rows))
    got = [(r["k"], r["id"]) for r in rows]
    assert got == [tuple(t) for t in expect]


def test_global_index_deterministic_and_partition_count_insensitive(spark):
    from example_dms_dataexport_spark.operators import ordering

    df = spark.range(0, 500).select((F.col("id") % 499).alias("id")).distinct()
    a = ordering.global_index(df, ["id"], num_partitions=3).collect()
    b = ordering.global_index(df, ["id"], num_partitions=13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_global_index_validates_args(spark):
    from example_dms_dataexport_spark.operators import ordering

    df = spark.range(3)
    with pytest.raises(ValueError, match="order_by"):
        ordering.global_index(df, [])
    with pytest.raises(ValueError, match="already exists"):
        ordering.global_index(df, ["id"], index_col="id")
    with pytest.raises(ValueError, match="__gidx_pid"):
        ordering.global_index(df.withColumn("__gidx_pid", F.lit(1)), ["id"])
    with pytest.raises(ValueError, match="__gidx_h"):
        ordering.shuffle_index(df.withColumn("__gidx_h", F.lit(1)), "id")


def test_global_index_reliable_checkpoint_variant(spark, tmp_path):
    """checkpoint_dir pins the range layout to shared storage (the
    executor-loss-safe cluster variant): same output as the default
    localCheckpoint path, with checkpoint data genuinely on disk."""
    import os

    from example_dms_dataexport_spark.operators import ordering

    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 700).select(
        F.col("id"), (F.col("id") * 31 % 700).alias("k")
    )
    out = ordering.global_index(
        df, [F.col("k"), F.col("id")], num_partitions=6, checkpoint_dir=ckpt
    ).collect()
    assert sorted(r["idx"] for r in out) == list(range(700))
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, ordering.global_index(
            df, [F.col("k"), F.col("id")], num_partitions=6
        ).collect())
    )
    # the pinned layout really landed in the reliable dir
    ckpt_files = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert ckpt_files, "no reliable checkpoint data written"


def test_shuffle_index_epochs_differ_but_replay(spark):
    from example_dms_dataexport_spark.operators import ordering

    df = spark.range(0, 300)
    e0 = ordering.shuffle_index(df, "id", seed="epoch0", num_partitions=5)
    e0b = ordering.shuffle_index(df, "id", seed="epoch0", num_partitions=5)
    e1 = ordering.shuffle_index(df, "id", seed="epoch1", num_partitions=5)
    r0 = sorted(map(tuple, e0.collect()))
    assert r0 == sorted(map(tuple, e0b.collect()))  # same seed replays
    r1 = dict(map(tuple, e1.collect()))
    moved = sum(1 for i, s in r0 if r1[i] != s)
    assert moved > 250  # a different epoch is a genuinely different order
    # both are permutations of 0..N-1
    assert sorted(s for _, s in r0) == list(range(300))


def test_global_index_plan_has_no_single_partition_sort(spark):
    """The scale contract: range exchange + per-partition assignment,
    never a global Window/Sort on one task."""
    from example_dms_dataexport_spark.operators import ordering

    df = spark.range(0, 100)
    out = ordering.global_index(df, ["id"], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_bpe_train_returned_segmentation_matches_bpe_segment(spark):
    from example_dms_dataexport_spark.operators.bpe import bpe_segment, bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low newer new"), (2, "wider new lower")],
        ["doc_id", "text"],
    )
    merges, seg = bpe_train(
        docs, num_merges=6, min_pair_count=2, return_segmentation=True
    )
    got = {r["w"]: tuple(r["syms"]) for r in seg.collect()}
    want = {
        r["w"]: tuple(r["syms"]) for r in bpe_segment(docs, merges).collect()
    }
    assert got == want


def test_bpe_train_local_and_distributed_paths_identical(spark):
    from example_dms_dataexport_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low newer new wider new"),
         (2, "wider new lower lowest widest low")],
        ["doc_id", "text"],
    )
    m_local, seg_local = bpe_train(
        docs, num_merges=7, min_pair_count=2, return_segmentation=True
    )
    m_dist, seg_dist = bpe_train(
        docs, num_merges=7, min_pair_count=2, return_segmentation=True,
        local_threshold=0,  # force the distributed merge loop
    )
    assert m_local == m_dist and len(m_local) > 0
    assert {r["w"]: tuple(r["syms"]) for r in seg_local.collect()} == {
        r["w"]: tuple(r["syms"]) for r in seg_dist.collect()
    }


def test_global_index_empty_input(spark):
    from example_dms_dataexport_spark.operators import ordering

    df = spark.range(0).select(F.col("id"))
    out = ordering.global_index(df, ["id"], num_partitions=4)
    assert out.count() == 0
    assert out.columns == ["id", "idx"]


def test_dedup_clusters_local_and_distributed_paths_identical(spark):
    # chain 1-2-3-4, star 10-(11,12,13), singleton pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        ["id_a", "id_b"],
    )
    local = dedup.dedup_clusters(pairs)
    dist = dedup.dedup_clusters(pairs, local_threshold=0)
    got_l = sorted(map(tuple, local.collect()))
    got_d = sorted(map(tuple, dist.collect()))
    assert got_l == got_d
    assert got_l == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
    ]
    assert local.schema == dist.schema


@pytest.mark.slow
def test_dedup_clusters_paths_identical_on_random_graphs(spark):
    import random

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got_l = sorted(map(tuple, dedup.dedup_clusters(pairs).collect()))
        got_d = sorted(
            map(tuple, dedup.dedup_clusters(pairs, local_threshold=0).collect())
        )
        assert got_l == got_d, (trial, edges)


# ---------------------------------------------------------------------------
# salted equi-join (operators/skewjoin.py)
# ---------------------------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    from example_dms_dataexport_spark.operators.skewjoin import salted_join

    # hot key 0 holds 80% of left rows; right has multiple rows per key
    left = spark.range(1000).selectExpr(
        "id AS rid", "CASE WHEN id % 5 < 4 THEN 0 ELSE id % 7 END AS k"
    )
    right = spark.range(40).selectExpr(
        "id % 8 AS k", "concat('v', id) AS val"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(left, right, ["k"], salt=4, how=how)
                .select("rid", "k", "val").collect())
        )
        want = sorted(
            map(tuple, left.join(right, ["k"], how)
                .select("rid", "k", "val").collect())
        )
        assert got == want, how
    assert len(got) > 1000  # the multi-match fan-out survived salting


def test_salted_join_spreads_hot_key_and_validates(spark):
    from example_dms_dataexport_spark.operators.skewjoin import (
        SALT_COL,
        salted_join,
    )

    left = spark.range(400).selectExpr("id AS rid", "0 AS k")
    right = spark.createDataFrame([(0, "x")], ["k", "val"])
    # the hot key's rows really land in multiple salt buckets
    salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*left.columns), F.lit(4))
    )
    assert salted.select(SALT_COL).distinct().count() == 4
    out = salted_join(left, right, ["k"], salt=4)
    assert out.count() == 400
    # unmatched left keys survive a left join exactly once, with NULLs
    lonely = spark.createDataFrame([(1, 99), (2, 0)], ["rid", "k"])
    kept = salted_join(lonely, right, ["k"], salt=4, how="left").collect()
    assert sorted((r.rid, r.val) for r in kept) == [(1, None), (2, "x")]
    with pytest.raises(ValueError, match="salt must be"):
        salted_join(left, right, ["k"], salt=1)
    with pytest.raises(ValueError, match="unsupported"):
        salted_join(left, right, ["k"], how="right")
    with pytest.raises(ValueError, match="at least one key"):
        salted_join(left, right, [])


def test_global_index_restores_checkpoint_dir_on_failure(spark, tmp_path):
    """The session-global checkpoint dir is restored even when the
    materializing action throws (ADVICE r9): a failed global_index must
    not leave the SparkContext pointed at this operator's directory."""
    import os

    from example_dms_dataexport_spark.operators import ordering

    sc = spark.sparkContext
    saved = sc.getCheckpointDir()
    prior = str(tmp_path / "prior_ckpt")
    os.makedirs(prior, exist_ok=True)
    sc.setCheckpointDir(prior)
    try:
        bad = spark.range(10).select(
            F.col("id"),
            F.assert_true(F.col("id") < 5).cast("long").alias("g"),
        )
        with pytest.raises(Exception, match=""):
            ordering.global_index(
                bad,
                [F.col("g"), F.col("id")],
                checkpoint_dir=str(tmp_path / "op_ckpt"),
            )
        # setCheckpointDir appends UUID subdirs, so check the component
        got = sc.getCheckpointDir() or ""
        assert "prior_ckpt" in got and "op_ckpt" not in got
    finally:
        if saved is not None:
            sc.setCheckpointDir(saved)


# --- stdlib baseline JPEG codec --------------------------------------------


def _structured_jpeg_image(bytes_, bw):
    """The q132 fixture geometry: one 8x8 block per byte (constant level
    clamp(byte, 16, 239) + horizontal-frequency-4 stripe of amplitude
    byte % 3), bw blocks wide, zero-byte padded to the grid."""
    import numpy as np

    stripe = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    nb = max(1, len(bytes_))
    bh = -(-nb // bw)
    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for k in range(bw * bh):
        byte = bytes_[k] if k < len(bytes_) else 0
        v = min(239, max(16, byte))
        b = byte % 3
        blk = np.full((8, 8), v, dtype=np.int64) + b * stripe[np.newaxis, :]
        by, bx = divmod(k, bw)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk.astype("uint8")
    return img


def test_jpeg_structured_roundtrip_exact():
    """The q132 exactness contract: structured blocks survive the full
    lossy pipeline (forward DCT + rounding + Huffman + IDCT) EXACTLY."""
    import numpy as np

    from example_dms_dataexport_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    bytes_ = [0, 1, 2, 16, 17, 65, 127, 128, 200, 239, 254, 255]
    img = _structured_jpeg_image(bytes_, 5)
    raw = _encode_jpeg(img)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    w, h, nb, px, acn, aca = _decode_jpeg(raw)
    assert (w, h, nb) == (40, 24, 15)
    assert np.array_equal(px, img)
    assert acn == sum(1 for b in bytes_ if b % 3)
    assert aca == 8 * sum(b % 3 for b in bytes_)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_jpeg_generic_image_error_bounded(seed):
    """The encoder is a REAL lossy encoder: an arbitrary image round-
    trips within the unit-quant rounding bound (coefficient rounding
    errors of <=0.5 propagate through the orthonormal IDCT to a few
    intensity levels), exercising ZRL and varied run/size symbols."""
    import numpy as np

    from example_dms_dataexport_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    w, h, nb, px, acn, aca = _decode_jpeg(_encode_jpeg(img))
    assert (w, h, nb) == (32, 24, 12)
    err = np.abs(px.astype(int) - img.astype(int)).max()
    assert err <= 4, f"round-trip error {err} exceeds the rounding bound"
    assert acn > 0  # a random image has plenty of AC energy


def test_jpeg_decoder_variant_gates():
    """Unsupported baseline variants fail loudly with a Pillow pointer,
    never a silent wrong decode."""
    import struct

    from example_dms_dataexport_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    img = _structured_jpeg_image([65, 66], 2)
    raw = bytearray(_encode_jpeg(img))
    with pytest.raises(ValueError, match="not a JPEG"):
        _decode_jpeg(b"\x89PNG1234")
    # flip SOF0 -> SOF2 (progressive)
    sof = raw.find(b"\xff\xc0")
    prog = raw[:sof] + b"\xff\xc2" + raw[sof + 2 :]
    with pytest.raises(ValueError, match="baseline sequential.*pil"):
        _decode_jpeg(bytes(prog))
    # inject a DRI (restart interval) segment before SOS
    sos = raw.find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
    with pytest.raises(ValueError, match="estart interval.*pil"):
        _decode_jpeg(bytes(raw[:sos]) + dri + bytes(raw[sos:]))
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated|invalid"):
        _decode_jpeg(bytes(raw[:-20]))


def test_jpeg_roundtrip_decode_matches_python(spark):
    """Spark-side q132 shape: fixture -> decode across executors matches
    the byte-rule arithmetic (pickling-by-value contract incl. the
    numpy-laden closures)."""
    rows = [(0, "hello world"), (1, ""), (2, "abc"), (5, "Zz 9!"), (11, "q" * 23)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg(
            multimodal.jpeg_from_documents(docs)
        ).collect()
    }
    for doc_id, text in rows:
        b = list(text.encode())
        bw = (doc_id % 4) + 2
        nb = max(1, len(b))
        bh = -(-nb // bw)
        r = got[doc_id]
        assert (r["width"], r["height"], r["n_blocks"]) == (
            bw * 8, bh * 8, bw * bh,
        )
        pads = bw * bh - len(b)
        assert r["pix_sum"] == 64 * (
            sum(min(239, max(16, x)) for x in b) + 16 * pads
        )
        assert r["ac_nonzero"] == sum(1 for x in b if x % 3)
        assert r["ac_abs_sum"] == 8 * sum(x % 3 for x in b)


def test_jpeg_color_roundtrip_exact():
    """3-component 4:4:4: interleaved MCUs + per-component DC chains
    decode EXACTLY for the structured-luma / constant-chroma fixture,
    and a generic color image stays within the rounding bound."""
    import numpy as np

    from example_dms_dataexport_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    bytes_ = [0, 7, 65, 128, 239, 255, 3, 77]
    luma = _structured_jpeg_image(bytes_, 4)
    img = np.stack(
        [luma, np.full_like(luma, 128), np.full_like(luma, 128)], axis=2
    )
    w, h, nb, px, acn, aca = _decode_jpeg(_encode_jpeg(img))
    assert (w, h) == (32, 16)
    assert nb == 8 * 3  # per-component blocks, 3x the MCU count
    assert px.shape == (16, 32, 3)
    assert np.array_equal(px, img)
    assert acn == sum(1 for b in bytes_ if b % 3)
    assert aca == 8 * sum(b % 3 for b in bytes_)
    # generic color content: real lossy path, bounded error
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    _, _, nb2, px2, _, _ = _decode_jpeg(_encode_jpeg(rand))
    assert nb2 == 4 * 3
    assert np.abs(px2.astype(int) - rand.astype(int)).max() <= 4


def test_jpeg_color_spark_fixture_matches_rule(spark):
    rows = [(0, "color me"), (3, ""), (6, "xyz" * 9)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg(
            multimodal.jpeg_color_from_documents(docs)
        ).collect()
    }
    for doc_id, text in rows:
        b = list(text.encode())
        bw = (doc_id % 4) + 2
        bh = -(-max(1, len(b)) // bw)
        r = got[doc_id]
        assert r["n_blocks"] == bw * bh * 3
        pads = bw * bh - len(b)
        assert r["pix_sum"] == 64 * (
            sum(min(239, max(16, x)) for x in b) + 16 * pads
        ) + 2 * 128 * 64 * bw * bh
        assert r["ac_nonzero"] == sum(1 for x in b if x % 3)


# --- repetition filter edge cases -------------------------------------------


def test_repetition_stats_edges(spark):
    from example_dms_dataexport_spark.operators.text_analysis import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),  # empty: 0 tokens, trivially kept
            (2, "word"),  # 1 token: ZERO grams (sequence(1,0) guard)
            (3, "spam " * 50),  # one token repeated: 49 grams, 48 dups
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_2grams"] == 0 and got[1]["keep"]
    assert got[2]["n_tokens"] == 1 and got[2]["n_2grams"] == 0
    assert got[2]["keep"], "single-token doc must keep trivially"
    assert got[3]["n_2grams"] == 49
    assert got[3]["n_dup_2grams"] == 48 and got[3]["top_2gram_n"] == 49
    assert not got[3]["keep"], "pure repetition must be rejected"
    # 'the' appears twice -> 2-grams 'over the' vs 'the quick'/'the lazy'
    # are all distinct: 8 grams, 0 dups, top count 1
    assert got[4]["n_2grams"] == 8 and got[4]["n_dup_2grams"] == 0
    assert got[4]["top_2gram_n"] == 1 and got[4]["keep"]


# ------------------------------------------------------------------ #
# unigram-LM tokenizer trainer (SentencePiece-style Viterbi-EM)      #
# ------------------------------------------------------------------ #

UNIGRAM_TEXTS = [
    "low low low lower lower lowest",
    "new newer newest new new",
    "widow widow window window",
    "banana bandana banana",
]


def _unigram_docs(spark):
    return spark.createDataFrame([(t,) for t in UNIGRAM_TEXTS], ["text"])


def test_unigram_train_properties(spark):
    from example_dms_dataexport_spark.operators.unigram import unigram_train

    vocab = unigram_train(
        _unigram_docs(spark), vocab_size=12, max_piece_len=6,
        seed_size=256, em_iters=3,
    )
    pieces = dict(vocab)
    alphabet = {c for t in UNIGRAM_TEXTS for c in t if c != " "}
    # coverage invariant: every corpus character is a piece
    assert alphabet <= set(pieces)
    multi = [p for p in pieces if len(p) > 1]
    assert 0 < len(multi) <= 12
    assert all(lp <= 0.0 and lp == lp for lp in pieces.values())
    # deterministic: same corpus, same result
    again = unigram_train(
        _unigram_docs(spark), vocab_size=12, max_piece_len=6,
        seed_size=256, em_iters=3,
    )
    assert vocab == again
    import pytest as _pytest

    with _pytest.raises(ValueError):
        unigram_train(_unigram_docs(spark), vocab_size=0)
    with _pytest.raises(ValueError):
        unigram_train(_unigram_docs(spark), em_iters=0)


def test_unigram_local_and_distributed_paths_identical(spark):
    from example_dms_dataexport_spark.operators.unigram import unigram_train

    kw = dict(vocab_size=10, max_piece_len=5, seed_size=200, em_iters=3)
    local = unigram_train(_unigram_docs(spark), **kw)
    dist = unigram_train(
        _unigram_docs(spark), local_threshold=0, **kw
    )  # force the mapInPandas E-step
    assert local == dist and len(local) > 0


def test_unigram_segment_reconstructs_words(spark):
    from example_dms_dataexport_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
    )

    docs = _unigram_docs(spark)
    vocab = unigram_train(
        docs, vocab_size=12, max_piece_len=6, seed_size=256, em_iters=3
    )
    allowed = {p for p, _ in vocab}
    got = {r["w"]: list(r["pieces"]) for r in unigram_segment(docs, vocab).collect()}
    words = {w for t in UNIGRAM_TEXTS for w in t.split()}
    assert set(got) == words
    for w, seg in got.items():
        assert "".join(seg) == w, (w, seg)
        assert all(p in allowed for p in seg), (w, seg)
    # a frequent whole word should have learned a coarse segmentation
    assert len(got["low"]) < 3
