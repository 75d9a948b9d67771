"""Scan-scoped CDC merge: exact touched-file discovery via a pk-column
semi-join — the layout-independent rewrite-amplification fix for flat
targets UNCLUSTERED on their key (where the zone map cannot prune and
the old fallback was a full-table rewrite per batch).

Pins:
- parity with the full recompute, with inode-carry proof that files
  holding no batch key were never rewritten;
- a pure-insert batch (absent keys) carries EVERY file;
- the touched set is exact: every file holding a batch key is replaced;
- single-file tables and hive-on-disk layouts decline (fall back).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from example_dms_dataexport_spark.cdc import merge_and_write
from example_dms_dataexport_spark.merge import apply_changes
from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse

VC = ["_dms_filename", "_dms_rownum"]


def _unclustered(spark, n=2000, files=16):
    """pk scattered across files (hash layout on an unrelated column —
    the retrofitted-table shape where zone maps are useless)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 97).alias("val"),
            F.concat(F.lit("r-"), F.col("id")).alias("name"),
        )
        .repartition(files, "val")
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, pk long, val long, name string, "
        "_dms_filename string, _dms_rownum long",
    )


def _inodes(path):
    return {
        n: os.stat(os.path.join(path, n)).st_ino
        for n in os.listdir(path)
        if n.endswith(".parquet")
    }


def test_scan_scope_parity_and_inode_carry(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_unclustered(spark), "t")
    assert wh.zonemap("t") is None
    before = _inodes(wh.path("t"))
    assert len(before) > 4
    target = wh.read(spark, "t").select("pk", "val", "name")
    ch = _changes(
        spark,
        [
            ("U", 5, 999, "upd", "f1", 1),
            ("D", 1000, 0, "x", "f1", 2),
            ("I", 99999, 1, "new", "f1", 3),
        ],
    )
    expect = {
        (r.pk, r.val, r.name)
        for r in apply_changes(target, ch, pks=["pk"], version_cols=VC).collect()
    }
    # PRE-state holders of the changed pks: the only files the scan
    # scope is allowed to replace
    base = wh.path("t")
    holders = {
        os.path.basename(r["__fp"])
        for r in spark.read.parquet(base)
        .select("pk", F.col("_metadata.file_path").alias("__fp"))
        .filter(F.col("pk").isin([5, 1000]))
        .collect()
    }
    n = merge_and_write(wh, "t", target, ch, pks=["pk"], version_cols=VC)
    got = {(r.pk, r.val, r.name) for r in wh.read(spark, "t").collect()}
    assert got == expect
    after = _inodes(wh.path("t"))
    carried = [r for r in before if after.get(r) == before[r]]
    assert carried, "scan scope carried nothing"
    assert n < 2000, "rewrite was not sub-linear"
    replaced = [r for r in before if r not in after]
    assert replaced, "no file was replaced"
    # exactness: ONLY files that held pk 5 or 1000 were replaced
    assert set(replaced) <= holders, (
        f"scan scope replaced untouched files: {set(replaced) - holders}"
    )


def test_scan_scope_pure_insert_carries_everything(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_unclustered(spark, 500, 8), "t")
    before = _inodes(wh.path("t"))
    target = wh.read(spark, "t").select("pk", "val", "name")
    ch = _changes(spark, [("I", 777777, 3, "new", "f1", 1)])
    merge_and_write(wh, "t", target, ch, pks=["pk"], version_cols=VC)
    after = _inodes(wh.path("t"))
    for rel, ino in before.items():
        assert after[rel] == ino, f"pure insert rewrote {rel}"
    assert wh.read(spark, "t").count() == 501


def test_scan_scope_declines_single_file_and_hive(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    # single file: nothing to prune against -> full path, correct content
    wh.overwrite(_unclustered(spark, 100, 8).coalesce(1), "one")
    target = wh.read(spark, "one").select("pk", "val", "name")
    ch = _changes(spark, [("U", 5, 1234, "u", "f1", 1)])
    n = merge_and_write(wh, "one", target, ch, pks=["pk"], version_cols=VC)
    assert n == 100  # whole-table path
    assert wh.read(spark, "one").filter("pk = 5").first().val == 1234
    # hive-on-disk without partition_by: declines, content still correct
    wh.overwrite(
        _unclustered(spark, 100, 4).withColumn("part", F.col("pk") % 2),
        "h",
        partition_by=["part"],
    )
    target = wh.read(spark, "h").select("pk", "val", "name", "part")
    ch2 = spark.createDataFrame(
        [("U", 5, 55, "u", 1, "f1", 1)],
        "op string, pk long, val long, name string, part long, "
        "_dms_filename string, _dms_rownum long",
    )
    n = merge_and_write(wh, "h", target, ch2, pks=["pk"], version_cols=VC)
    assert n == 100
    assert wh.read(spark, "h").filter("pk = 5").first().val == 55
