"""Maintenance passes: per-partition recluster (compact(sort_by=...))
and crash-orphan vacuum.

Pins:
- compact(sort_by) rewrites every leaf range-sorted so each hive
  partition's files regain narrow DISJOINT zone bands (the hybrid merge
  scope's precondition), creating the zone map over the sort columns
  when the table had none, and preserving content exactly;
- plain compact stays an idempotent bin-pack (sortedness is orthogonal);
- vacuum removes only TTL-expired staging orphans (.tmp-/.old-/
  .compact- + uuid hex) and never touches live data, manifests, locks,
  or fresh staging.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse


def _rows(spark, n=2000, files=4):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 5).alias("bucket"),
            F.concat(F.lit("m-"), F.col("id")).alias("name"),
        )
        .repartition(files, "pk")
    )


def test_compact_sort_by_restores_partition_bands(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    # each partition dir gets ~4 files, each spanning ~the full pk range
    wh.overwrite(_rows(spark), "t", partition_by=["bucket"])
    content = {(r.pk, r.bucket, r.name) for r in wh.read(spark, "t").collect()}
    rewritten = wh.compact(spark, "t", target_file_bytes=1, sort_by=["pk"])
    assert rewritten == 5  # every leaf rewrites on a sort pass
    zm = wh.zonemap("t")
    assert zm is not None and zm["stat_cols"] == ["pk"], (
        "sort pass must create the zone map it exists to enable"
    )
    # within each partition dir the files' pk bands must be disjoint
    by_dir: dict[str, list[tuple[int, int]]] = {}
    for rel, entry in zm["files"].items():
        lo, hi = entry["pk"]
        by_dir.setdefault(os.path.dirname(rel), []).append((lo, hi))
    multi = {d: sorted(bs) for d, bs in by_dir.items() if len(bs) > 1}
    assert multi, "fixture produced single-file partitions; no bands to check"
    for d, bands in multi.items():
        for (l0, h0), (l1, h1) in zip(bands, bands[1:]):
            assert h0 < l1, f"{d}: overlapping bands {(l0, h0)} {(l1, h1)}"
    assert {
        (r.pk, r.bucket, r.name) for r in wh.read(spark, "t").collect()
    } == content


def test_plain_compact_still_idempotent(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_rows(spark), "t", partition_by=["bucket"])
    assert wh.compact(spark, "t") == 5  # tiny files bin-pack to 1/dir
    assert wh.compact(spark, "t") == 0  # second pass is a no-op


def test_vacuum_removes_expired_orphans_only(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_rows(spark), "t", stat_cols=["pk"])
    root = wh.root
    hx = "0123456789abcdef" * 2  # full uuid4 hex (32 chars)
    orphans = [
        os.path.join(root, f".tmp-t-{hx}"),
        os.path.join(root, f".old-t-{hx}"),
        os.path.join(root, f"t.compact-{hx}"),
        os.path.join(root, f"t.old-{hx}"),
    ]
    for d in orphans:
        os.makedirs(d)
    orphan_file = os.path.join(root, "t", f"_bloom.json.tmp-{hx}")
    with open(orphan_file, "w") as f:
        f.write("{}")
    # fresh staging (a LIVE writer's temp) must survive a TTL'd vacuum
    live = os.path.join(root, f".tmp-t-{'f' * 32}")
    os.makedirs(live)
    removed = wh.vacuum(ttl_seconds=-5)  # everything is "old enough"
    # ttl=-5 expires even the live dir; re-create and check TTL respect
    assert len(removed) == 6
    for d in orphans:
        assert not os.path.exists(d)
    assert not os.path.exists(orphan_file)
    os.makedirs(live)
    assert wh.vacuum(ttl_seconds=3600) == []  # too fresh: kept
    assert os.path.isdir(live)
    # live state untouched throughout: data, zone map, content
    assert wh.zonemap("t") is not None
    assert wh.read(spark, "t").count() == 2000


def test_vacuum_never_removes_torn_swap_remnants(spark, tmp_path):
    """A crash between a commit swap's two renames leaves the table dir
    missing and the committed data ONLY in .old-* (rename keeps the old
    mtime, so TTL cannot protect it) — vacuum must skip such dirs."""
    import shutil as _sh

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_rows(spark), "t")
    hx = "ab" * 16
    old = os.path.join(wh.root, f".old-t-{hx}")
    tmp = os.path.join(wh.root, f".tmp-t-{hx}")
    # simulate the torn window: table dir renamed away, tmp staged
    os.rename(wh.path("t"), old)
    os.makedirs(tmp)
    assert wh.vacuum(ttl_seconds=-5) == [], "vacuum ate a torn swap"
    assert os.path.isdir(old) and os.path.isdir(tmp)
    # manual recovery, then the same names ARE removable orphans
    os.rename(old, wh.path("t"))
    removed = wh.vacuum(ttl_seconds=-5)
    assert removed == [f".tmp-t-{hx}"]
    assert wh.read(spark, "t").count() == 2000
    _sh.rmtree(tmp, ignore_errors=True)


def test_layout_drift_signals_recluster(spark, tmp_path):
    """The metadata-only drift score: ~files on a shuffled layout,
    ~1.0 after recluster — the scheduling signal, zero data I/O."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(
        _rows(spark, n=4000, files=8).drop("bucket"), "t",
        stat_cols=["pk"],
    )
    drift = wh.layout_drift("t")
    assert drift["files"] == 8
    assert drift["avg_cover"] > 4, f"shuffled layout reads clustered: {drift}"
    assert drift["max_cover"] >= drift["avg_cover"] - 1
    wh.recluster(spark, "t", cluster_partitions=8)
    after = wh.layout_drift("t", "pk")
    assert after["avg_cover"] < 1.2, f"recluster left drift: {after}"
    assert after["max_cover"] <= 2  # adjacent bands may touch at edges
    import pytest as _pt

    with _pt.raises(ValueError, match="not in zone map"):
        wh.layout_drift("t", "name")
    wh2 = ParquetWarehouse(str(tmp_path / "wh2"))
    wh2.overwrite(_rows(spark), "u")
    with _pt.raises(ValueError, match="no zone map"):
        wh2.layout_drift("u")


def test_delete_where_predicate_form(spark, tmp_path):
    import os as _os

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_rows(spark), "t")
    before = {
        n: _os.stat(_os.path.join(wh.path("t"), n)).st_ino
        for n in _os.listdir(wh.path("t"))
        if n.endswith(".parquet")
    }
    res = wh.delete_where(spark, "t", "pk", "pk % 100 = 7 AND bucket < 3")
    assert res["n_keys"] == {
        r.pk
        for r in _rows(spark).filter("pk % 100 = 7 AND bucket < 3").collect()
    }.__len__()
    assert {
        n: _os.stat(_os.path.join(wh.path("t"), n)).st_ino
        for n in _os.listdir(wh.path("t"))
        if n.endswith(".parquet")
    } == before, "delete_where touched a data file"
    got = {r.pk for r in wh.read(spark, "t").collect()}
    assert got == {
        r.pk
        for r in _rows(spark).filter(
            "NOT (pk % 100 = 7 AND bucket < 3)"
        ).collect()
    }


def test_layout_drift_gaps_and_points(spark, tmp_path):
    """Gaps between disjoint bands must not dilute the score (union
    denominator), and all-point bands fall back to the sweep's peak."""
    import json

    from example_dms_dataexport_spark.sources.warehouse import ZONEMAP_FILE

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_rows(spark, files=2).drop("bucket"), "t", stat_cols=["pk"])
    zm_path = os.path.join(wh.path("t"), ZONEMAP_FILE)
    with open(zm_path) as f:
        zm = json.load(f)
    names = sorted(zm["files"])
    # two disjoint bands separated by a huge gap: perfectly clustered
    zm["files"][names[0]]["pk"] = [0, 10]
    zm["files"][names[1]]["pk"] = [1000, 1010]
    with open(zm_path, "w") as f:
        json.dump(zm, f)
    d = wh.layout_drift("t")
    assert d["avg_cover"] == 1.0 and d["max_cover"] == 1, d
    # all-point bands: distinct single-key files are clustered (peak 1)
    zm["files"][names[0]]["pk"] = [5, 5]
    zm["files"][names[1]]["pk"] = [9, 9]
    with open(zm_path, "w") as f:
        json.dump(zm, f)
    d = wh.layout_drift("t")
    assert d["avg_cover"] == 1.0 and d["max_cover"] == 1, d


def test_compaction_debt_advisor(spark, tmp_path):
    """Metadata-only small-file debt: counts match what compact then
    actually rewrites, and a compacted table reports zero debt."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.overwrite(_rows(spark), "t", partition_by=["bucket"])
    debt = wh.compaction_debt("t", target_file_bytes=1 << 30)
    assert debt["leaves"] == 5 and debt["leaves_over_target"] == 5
    assert debt["files"] == debt["excess_files"] + 5  # ideal is 1/leaf
    rewritten = wh.compact(spark, "t", target_file_bytes=1 << 30)
    assert rewritten == debt["leaves_over_target"]
    after = wh.compaction_debt("t", target_file_bytes=1 << 30)
    assert after == {
        "leaves": 5, "leaves_over_target": 0,
        "files": 5, "excess_files": 0,
    }
