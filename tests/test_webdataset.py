"""WebDataset tar-shard export/ingest (sources/webdataset.py)."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.sources import webdataset as WDS

SF_DIR = "/root/testdata/sf0.001"
COLS = {"text": "txt", "meta": "json", "blob": "bin"}


@pytest.fixture(scope="module")
def samples(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "doc_id",
        "text",
        F.struct("lang", "source", "n_chars").alias("meta"),
        F.encode(F.reverse(F.col("text")), "utf-8").alias("blob"),
    )


@pytest.fixture(scope="module")
def exported(samples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds") / "corpus")
    manifest = WDS.write_webdataset(samples, out, COLS, key_col="doc_id")
    return out, manifest


def test_manifest_and_layout(exported, samples):
    out, manifest = exported
    assert manifest["total_samples"] == samples.count()
    assert manifest["columns"] == COLS
    on_disk = sorted(
        f for f in os.listdir(out) if f.startswith("shard-")
    )
    assert on_disk == [s["file"] for s in manifest["shards"]]
    with open(os.path.join(out, WDS.WDS_MANIFEST)) as f:
        assert json.load(f) == manifest
    for s in manifest["shards"]:
        assert s["bytes"] == os.path.getsize(os.path.join(out, s["file"]))


def test_tar_contents_follow_the_convention(exported):
    """Entries are <key>.<ext>, canonical metadata, samples contiguous
    and key-sorted within each shard."""
    out, manifest = exported
    seen = set()
    for s in manifest["shards"]:
        with tarfile.open(os.path.join(out, s["file"])) as tf:
            keys = []
            for ti in tf:
                base, _, ext = ti.name.rpartition(".")
                assert ext in COLS.values()
                assert ti.mtime == 0 and ti.uid == 0 and ti.gid == 0
                if not keys or keys[-1] != base:
                    keys.append(base)
            assert keys == sorted(keys)
            assert len(keys) == s["samples"]
            assert not (set(keys) & seen)  # keys unique across shards
            seen |= set(keys)


def test_export_is_byte_deterministic(samples, exported, tmp_path_factory):
    out, manifest = exported
    out2 = str(tmp_path_factory.mktemp("wds2") / "corpus")
    m2 = WDS.write_webdataset(
        samples.repartition(13), out2, COLS, key_col="doc_id"
    )
    assert m2 == manifest

    def digest(d):
        return {
            f: hashlib.sha256(
                open(os.path.join(d, f), "rb").read()
            ).hexdigest()
            for f in os.listdir(d)
            if f.startswith("shard-")
        }

    assert digest(out) == digest(out2)


def test_round_trip(spark, samples, exported):
    out, _ = exported
    back = WDS.read_webdataset(spark, out)
    got = {
        r["__key"]: (r["text"], r["meta"], r["blob"])
        for r in back.collect()
    }
    want = {
        str(r["doc_id"]): (
            r["text"].encode(),
            json.dumps(
                {
                    "lang": r["meta"]["lang"],
                    "source": r["meta"]["source"],
                    "n_chars": r["meta"]["n_chars"],
                },
                sort_keys=True,
                separators=(",", ":"),
            ).encode(),
            bytes(r["blob"]),
        )
        for r in samples.collect()
    }
    assert got == want


def test_refusals(spark, samples, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wdsr") / "x")
    with pytest.raises(ValueError, match="not in DataFrame"):
        WDS.write_webdataset(samples, out, {"nope": "txt"})
    with pytest.raises(ValueError, match="NULL sample keys"):
        WDS.write_webdataset(
            samples.withColumn(
                "doc_id",
                F.when(F.col("doc_id") == 0, None).otherwise(F.col("doc_id")),
            ),
            out,
            COLS,
        )
    with pytest.raises(Exception, match="duplicate sample key"):
        WDS.write_webdataset(
            samples.unionByName(samples.limit(1)), out, COLS
        )


def test_null_entry_skips_modality(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(1, "a", b"x"), (2, None, b"y")], "doc_id long, text string, blob binary"
    )
    out = str(tmp_path_factory.mktemp("wdsn") / "x")
    WDS.write_webdataset(df, out, {"text": "txt", "blob": "bin"}, n_shards=1)
    back = {
        r["__key"]: (r["text"], r["blob"])
        for r in WDS.read_webdataset(spark, out).collect()
    }
    assert back["1"] == (b"a", b"x")
    assert back["2"] == (None, b"y")


def test_multimodal_pnm_survives_the_tar_round_trip(spark, tmp_path_factory):
    """End-to-end multimodal hand-off: real binary PNM images export as
    tar entries and decode IDENTICALLY after the round trip — the format
    is a faithful media carrier, not just a text one."""
    from example_dms_dataexport_spark.operators import multimodal

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 7 == 0)
    )
    imgs = multimodal.pnm_from_documents(docs)
    out = str(tmp_path_factory.mktemp("wdsm") / "imgs")
    WDS.write_webdataset(imgs, out, {"media": "pnm"}, key_col="doc_id")
    back = WDS.read_webdataset(spark, out).select(
        F.col("__key").cast("long").alias("doc_id"), "media"
    )
    want = {
        r["doc_id"]: (r["format"], r["width"], r["height"], r["channels"], r["pix_sum"])
        for r in multimodal.decode_pnm(imgs).collect()
    }
    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"], r["channels"], r["pix_sum"])
        for r in multimodal.decode_pnm(back).collect()
    }
    assert got == want and len(got) == docs.count()


def test_failed_export_cleans_its_staging_dir(spark, samples, tmp_path):
    out = str(tmp_path / "x")
    with pytest.raises(Exception, match="duplicate sample key"):
        WDS.write_webdataset(
            samples.unionByName(samples.limit(1)), out, COLS
        )
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert leftovers == []
    assert not os.path.exists(out)


def test_empty_corpus_exports_manifest_only(spark, tmp_path):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty")
    m = WDS.write_webdataset(df, out, {"text": "txt"}, n_shards=2)
    assert m["total_samples"] == 0 and m["n_shards"] == 0
    assert os.listdir(out) == [WDS.WDS_MANIFEST]


def test_no_attempt_temp_files_survive_the_commit(exported):
    """Each task attempt streams to a '.shard-*.attempt-*.tmp' name and
    renames into place on success (speculative-execution / zombie-retry
    guard); the committed dir must hold only final shards + manifest."""
    out, _ = exported
    stray = [
        f
        for f in os.listdir(out)
        if not (f.startswith("shard-") or f == WDS.WDS_MANIFEST)
    ]
    assert stray == []


def test_foreign_tar_directory_members_are_skipped(spark, tmp_path):
    """tarfile.extractfile returns None for dirs/symlinks; a foreign
    webdataset tar carrying a directory entry must be skipped, not
    crash the untar task."""
    import io

    out = tmp_path / "foreign"
    out.mkdir()
    with tarfile.open(out / "shard-000000.tar", "w") as tf:
        d = tarfile.TarInfo(name="subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        data = b"hello"
        ti = tarfile.TarInfo(name="k1.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    rows = WDS.read_webdataset(
        spark, str(out), columns={"text": "txt"}
    ).collect()
    assert [(r["__key"], bytes(r["text"])) for r in rows] == [("k1", b"hello")]


def test_all_null_sample_refuses_loudly(spark, tmp_path):
    """A sample with NULL in every mapped column has no tar
    representation — counting it would overcount the manifest vs what
    read_webdataset can reassemble, so it refuses like NULL keys."""
    df = spark.createDataFrame(
        [(1, "ok", b"x"), (2, None, None)],
        "doc_id long, text string, blob binary",
    )
    with pytest.raises(Exception, match="NULL in every mapped"):
        WDS.write_webdataset(
            df, str(tmp_path / "w"), {"text": "txt", "blob": "bin"},
            key_col="doc_id",
        )
    assert not (tmp_path / "w").exists()  # staging cleaned up
