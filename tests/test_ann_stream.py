"""Streaming ANN-index ingest (streaming/ann_stream.py): CDC-style
vector landing files extend the managed index per micro-batch."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from example_dms_dataexport_spark.operators import ann_index as AI
from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse
from example_dms_dataexport_spark.streaming.ann_stream import (
    ann_ingest_schema,
    start_ann_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"
N_LISTS = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _land_batches(spark, emb, landing: str, n_batches: int = 3):
    """One parquet landing file per batch (vec_id % n_batches == i, odd
    ids only — the evens built the index)."""
    os.makedirs(landing, exist_ok=True)
    schema = ann_ingest_schema()
    for i in range(n_batches):
        part = (
            emb.filter(F.col("vec_id") % 2 == 1)
            .filter(F.col("vec_id") % n_batches == i)
            .select(
                F.col("vec_id").cast("long").alias("vec_id"),
                F.col("embedding").cast(schema["embedding"].dataType),
            )
        )
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"batch-{i}")
        )


def _part_inodes(root):
    out = {}
    for dp, _, fns in os.walk(root):
        for fn in fns:
            if fn.endswith(".parquet"):
                p = os.path.join(dp, fn)
                out[os.path.relpath(p, root)] = os.stat(p).st_ino
    return out


@pytest.mark.slow
def test_stream_extends_to_the_union_and_replays_idempotently(
    spark, emb, tmp_path
):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    d = AI.build_ann_index(wh, even, "idx", n_lists=N_LISTS, m=8, k=32)

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    _land_batches(spark, emb, landing)

    q = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    # index holds exactly the union, codes from the FROZEN codebooks
    tbl = wh.read(spark, "idx")
    assert {r["vec_id"] for r in tbl.select("vec_id").collect()} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    assert wh.read_meta("idx")[AI.ANN_META_KEY] == d

    # restart on the same checkpoint with no new files: pure no-op
    before = _part_inodes(wh.path("idx"))
    q2 = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", ckpt, max_files_per_trigger=1
    )
    q2.awaitTermination(120)
    assert _part_inodes(wh.path("idx")) == before

    # crash-replay (checkpoint lost, every batch re-delivered): the
    # already-indexed anti-join makes each extend an empty no-op — the
    # append-only contract holds and no partition file is touched
    shutil.rmtree(ckpt)
    q3 = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    q3.awaitTermination(120)
    assert _part_inodes(wh.path("idx")) == before
    assert tbl.count() == emb.count()


def test_micro_batches_touch_only_their_lists(spark, emb, tmp_path):
    """Per-batch partition scoping: lists untouched by a batch keep
    their inodes across that batch's extend (the batch-extend inode
    contract, streamed)."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    AI.build_ann_index(wh, even, "idx", n_lists=N_LISTS, m=8, k=32)

    # one landing file holding ONE odd vector: its extend touches
    # exactly one list
    one = (
        emb.filter(F.col("vec_id") % 2 == 1)
        .orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").cast(
                ann_ingest_schema()["embedding"].dataType
            ),
        )
    )
    landing = str(tmp_path / "landing")
    one.coalesce(1).write.parquet(os.path.join(landing, "batch-0"))

    before = _part_inodes(wh.path("idx"))
    q = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    after = _part_inodes(wh.path("idx"))

    vid = one.first()["vec_id"]
    lst = (
        wh.read(spark, "idx")
        .filter(F.col("vec_id") == vid)
        .select("list_id")
        .first()["list_id"]
    )
    untouched = {
        rel: ino
        for rel, ino in before.items()
        if not rel.startswith(f"list_id={lst}/")
    }
    for rel, ino in untouched.items():
        assert after.get(rel) == ino, f"untouched list rewritten: {rel}"


def test_refuses_a_missing_index(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    with pytest.raises(Exception):
        start_ann_ingest_stream(
            spark, str(tmp_path / "landing") + "/*", wh, "nope",
            str(tmp_path / "ckpt"),
        )


def test_stream_compaction_folds_appended_files(spark, emb, tmp_path):
    """compact_every folds append-mode file accretion back to one file
    per leaf without changing what the index says."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    AI.build_ann_index(wh, even, "idx", n_lists=N_LISTS, m=8, k=32)

    landing = str(tmp_path / "landing")
    _land_batches(spark, emb, landing)
    q = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt"),
        max_files_per_trigger=1, compact_every=1,
        compact_target_bytes=1 << 30,
    )
    q.awaitTermination(120)

    root = wh.path("idx")
    for d in os.listdir(root):
        if d.startswith("list_id="):
            files = [
                f for f in os.listdir(os.path.join(root, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, f"{d} not folded: {files}"
    got = {r["vec_id"] for r in wh.read(spark, "idx").select("vec_id").collect()}
    assert got == {r["vec_id"] for r in emb.select("vec_id").collect()}


def test_changed_vector_under_existing_id_refuses_loudly(
    spark, emb, tmp_path
):
    """The replay reconciliation verifies dropped ids are TRUE replays:
    a new landing file carrying a DIFFERENT embedding for an indexed id
    (an upsert attempt) fails the stream loudly instead of being
    silently discarded."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    AI.build_ann_index(wh, even, "idx", n_lists=N_LISTS, m=8, k=32)

    changed = (
        even.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.transform(
                F.col("embedding").cast(
                    ann_ingest_schema()["embedding"].dataType
                ),
                lambda x: x * 3.0 + 1.0,
            ).alias("embedding"),
        )
    )
    landing = str(tmp_path / "landing")
    changed.coalesce(1).write.parquet(os.path.join(landing, "batch-0"))

    q = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt")
    )
    with pytest.raises(Exception, match="DIFFERENT|StreamingQuery"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_inadmissible_dup_vector_refuses_loudly(spark, emb, tmp_path):
    """r17 advisor finding: an existing vec_id re-landing with an
    INADMISSIBLE vector (wrong dimension) is not a replay — the encoder
    would filter it before the code/vnorm comparison, so it must refuse
    instead of anti-joining away silently."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    AI.build_ann_index(wh, even, "idx", n_lists=N_LISTS, m=8, k=32)

    bad = (
        even.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.slice(
                F.col("embedding").cast(
                    ann_ingest_schema()["embedding"].dataType
                ),
                1, 3,  # wrong dimension: filtered by encode admission
            ).alias("embedding"),
        )
    )
    landing = str(tmp_path / "landing")
    bad.coalesce(1).write.parquet(os.path.join(landing, "batch-0"))

    q = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt")
    )
    with pytest.raises(Exception, match="INADMISSIBLE|StreamingQuery"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_stream_bootstraps_and_extends_vec_id_bloom(spark, emb, tmp_path):
    """r18 (verdict task 3): stream start writes the vec_id manifest if
    absent, appends extend it, and the dup probe opens only bloom-hit
    partition files — never the whole index."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    AI.build_ann_index(wh, even, "idx", n_lists=N_LISTS, m=8, k=32)
    assert wh.bloom("idx") is None  # build does not write one

    landing = str(tmp_path / "landing")
    _land_batches(spark, emb, landing)
    q = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    bm = wh.bloom("idx")
    assert bm is not None and "vec_id" in bm["cols"]
    n_files = len(bm["files"])
    # manifest EXTENDED by the appends: it describes the live file set
    # (a dropped-then-absent manifest would have failed read_bloom_keys)
    some = [
        r["vec_id"]
        for r in wh.read(spark, "idx").select("vec_id").limit(2).collect()
    ]
    hit = wh.read_bloom_keys(spark, "idx", "vec_id", some)
    assert 0 < len(hit.inputFiles()) < n_files
    assert {r["vec_id"] for r in hit.select("vec_id").collect()} == set(some)
    # replay from a fresh checkpoint stays a no-op (identity with the
    # full-join reconciliation) and keeps the manifest live
    before = _part_inodes(wh.path("idx"))
    q2 = start_ann_ingest_stream(
        spark, landing + "/*", wh, "idx", str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert _part_inodes(wh.path("idx")) == before
    assert wh.bloom("idx") is not None
