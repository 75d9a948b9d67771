"""WordPiece trainer/encoder (operators/wordpiece.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import wordpiece as WP
from example_dms_dataexport_spark.operators.bpe import bpe_train

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_continuation_convention(spark):
    rows = {
        r["w"]: list(r["syms"])
        for r in WP.wp_word_counts(_df(spark, ["word word ab"])).collect()
    }
    assert rows["word"] == ["w", "##o", "##r", "##d"]
    assert rows["ab"] == ["a", "##b"]


def test_likelihood_ratio_beats_raw_frequency(spark):
    """'xy' always co-occur (count 4, singles 4/4); 'a'+'##b' co-occur 5
    times but 'a' also appears in many other words (count 5, singles
    25/5). Raw-frequency BPE merges (a,##b); WordPiece must merge the
    mutually-predictive (x,##y) first: 4/16 > 5/125."""
    texts = ["xy xy xy xy ab ab ab ab ab " + " ".join(f"a{c}" for c in "cdefghijklmnopqrst")]
    wp = WP.wordpiece_train(_df(spark, texts), num_merges=1)
    assert (wp["merges"][0][0], wp["merges"][0][1]) == ("x", "##y")
    bpe = bpe_train(_df(spark, texts), num_merges=1)
    assert (bpe[0][0], bpe[0][1]) == ("a", "b")


def test_fusion_strips_continuation_marker(spark):
    wp = WP.wordpiece_train(_df(spark, ["abc abc abc abc"]), num_merges=2)
    fused = {WP._wp_fuse(l, r) for l, r, _, _ in wp["merges"]}
    for f in fused:
        assert "####" not in f
    assert any(not f.startswith("##") or f.count("##") == 1 for f in fused)


def test_local_and_distributed_paths_identical(docs):
    sample = docs.filter(F.col("doc_id") % 5 == 0)
    a = WP.wordpiece_train(sample, num_merges=6)
    b = WP.wordpiece_train(sample, num_merges=6, local_threshold=0)
    assert [(l, r, n) for l, r, _, n in a["merges"]] == [
        (l, r, n) for l, r, _, n in b["merges"]
    ]
    for (_, _, sa, _), (_, _, sb, _) in zip(a["merges"], b["merges"]):
        assert sa == pytest.approx(sb, rel=1e-12)
    assert a["vocab"] == b["vocab"]


def test_vocab_is_initials_plus_fusions(spark):
    wp = WP.wordpiece_train(_df(spark, ["aa aa bb"]), num_merges=2)
    assert set(wp["vocab"]) >= {"a", "##a", "b", "##b"}
    for l, r, _, _ in wp["merges"]:
        assert WP._wp_fuse(l, r) in wp["vocab"]


def test_greedy_longest_match_encoding(spark):
    vocab = ["un", "##able", "##b", "a", "##a", "b", "u", "##n", "##le"]
    enc = {
        r["w"]: list(r["pieces"])
        for r in WP.wordpiece_segment(
            _df(spark, ["unable abba zoq"]), vocab
        ).collect()
    }
    assert enc["unable"] == ["un", "##able"]  # longest match first
    assert enc["abba"] == ["a", "##b", "##b", "##a"]
    assert enc["zoq"] == ["[UNK]"]  # unmatchable remainder -> whole-word UNK


def test_roundtrip_on_corpus(docs):
    """Every trained piece is usable: encoding the training corpus with
    the final vocab yields no UNK (all initial chars are in-vocab) and
    concatenating pieces reconstructs each word."""
    wp = WP.wordpiece_train(docs, num_merges=8)
    enc = WP.wordpiece_segment(docs, wp["vocab"])
    bad = enc.filter(F.array_contains("pieces", "[UNK]")).count()
    assert bad == 0
    recon = enc.select(
        "w",
        F.array_join(
            F.transform(
                "pieces", lambda p: F.regexp_replace(p, "^##", "")
            ),
            "",
        ).alias("r"),
    )
    assert recon.filter(F.col("w") != F.col("r")).count() == 0


def test_duckdb_oracle_parity(docs):
    """The register-ready DuckDB oracle replays training identically:
    same merges, same order, same pair counts, same double scores —
    the q81-BPE parity contract run in pytest until a driver face slot
    opens."""
    import duckdb

    got = WP.wordpiece_train(docs, num_merges=6)["merges"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.execute(WP.wordpiece_oracle_sql(6)).fetchall()
    assert [(r[1], r[2], r[4]) for r in rows] == [
        (l, r, n) for l, r, _, n in got
    ]
    for (_, _, _, sql_score, _), (_, _, py_score, _) in zip(rows, got):
        assert sql_score == pytest.approx(py_score, rel=1e-12)
