"""Whole-epoch group commits for co-streamed CDC tables.

``start_cdc_group_stream`` is the streaming analogue of
``run_queue(group=...)``: every micro-batch epoch merges each member's
slice, then publishes ONE ``commit_group_linked`` snapshot. Pins:

- parity: final table states match the per-table batch merge result,
  and ``read_group`` resolves both members at the same epoch;
- cross-table atomicity across a crash: a failure AFTER some member
  merges but BEFORE the group flip leaves the group resolving the
  PREVIOUS epoch for every member (never one new + one old); restarting
  from the checkpoint replays the epoch idempotently and the group then
  advances for all members together;
- mixed source formats (csv + parquet envelope normalization).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse
from example_dms_dataexport_spark.streaming.cdc_stream import (
    start_cdc_group_stream,
)


def _write_csv(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def _write_parquet(path, rows):
    # physical names differ from the target's — position is the contract
    pq.write_table(
        pa.table(
            {
                "Op": [r[0] for r in rows],
                "c1": [r[1] for r in rows],
                "c2": [r[2] for r in rows],
            }
        ),
        str(path),
    )


def _seed(spark, wh, tmp_path):
    cust_landing = tmp_path / "cust"
    ord_landing = tmp_path / "ord"
    cust_landing.mkdir()
    ord_landing.mkdir()
    wh.overwrite(
        spark.createDataFrame(
            [(1, "alice", 10.0), (2, "bob", 20.0)], ["id", "name", "val"]
        ),
        "cust",
    )
    wh.overwrite(
        spark.createDataFrame([(1, 100), (2, 200)], ["oid", "amt"]), "ord"
    )
    members = {
        "cust": {"landing_glob": str(cust_landing / "2*.csv"), "pks": ["id"]},
        "ord": {
            "landing_glob": str(ord_landing / "2*.parquet"),
            "pks": ["oid"],
            "file_format": "parquet",
        },
    }
    return cust_landing, ord_landing, members


def test_group_stream_parity_and_consistent_epochs(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    cust_landing, ord_landing, members = _seed(spark, wh, tmp_path)
    # epoch files: update cust 1, insert cust 3; delete ord 2, insert ord 3
    _write_csv(
        cust_landing / "20240101-000000001.csv",
        [("U", 1, "alice2", 11.0), ("I", 3, "carol", 30.0)],
    )
    _write_parquet(
        ord_landing / "20240101-000000001.parquet",
        [("D", 2, 200), ("I", 3, 300)],
    )
    # a later pair of files (second epoch under maxFilesPerTrigger=1)
    _write_csv(
        cust_landing / "20240102-000000001.csv", [("U", 3, "carole", 31.0)]
    )
    _write_parquet(
        ord_landing / "20240102-000000001.parquet", [("U", 3, 301)]
    )
    q = start_cdc_group_stream(
        spark,
        members,
        wh,
        group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got_cust = {
        r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
    }
    got_ord = {r.oid: r.amt for r in wh.read(spark, "ord").collect()}
    assert got_cust == {
        1: ("alice2", 11.0),
        2: ("bob", 20.0),
        3: ("carole", 31.0),
    }
    assert got_ord == {1: 100, 3: 301}
    # the group resolves BOTH members at the final epoch
    snap = wh.read_group(spark, "sync")
    assert set(snap) == {"cust", "ord"}
    assert {
        r.id: (r.name, r.val) for r in snap["cust"].collect()
    } == got_cust
    assert {r.oid: r.amt for r in snap["ord"].collect()} == got_ord
    # restart on the same checkpoint: no new files -> no state change
    group_before = wh.group_members("sync")
    q2 = start_cdc_group_stream(
        spark,
        members,
        wh,
        group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    assert {
        r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
    } == got_cust
    assert wh.group_members("sync") == group_before


def test_group_stream_crash_before_flip_is_atomic(spark, tmp_path):
    """Driver dies after the members merged but before the group flip:
    readers of the group keep the PREVIOUS epoch for every member; the
    checkpoint replays the epoch on restart and the group advances for
    all members together."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    cust_landing, ord_landing, members = _seed(spark, wh, tmp_path)
    # epoch 1 commits cleanly
    _write_csv(
        cust_landing / "20240101-000000001.csv", [("U", 1, "alice2", 11.0)]
    )
    _write_parquet(
        ord_landing / "20240101-000000001.parquet", [("U", 1, 101)]
    )
    q = start_cdc_group_stream(
        spark,
        members,
        wh,
        group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    epoch1_cust = {
        r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
    }
    epoch1_ord = {r.oid: r.amt for r in wh.read(spark, "ord").collect()}
    assert epoch1_cust[1] == ("alice2", 11.0) and epoch1_ord[1] == 101

    # epoch 2 lands, but the group flip crashes
    _write_csv(
        cust_landing / "20240102-000000001.csv", [("U", 2, "bobby", 22.0)]
    )
    _write_parquet(
        ord_landing / "20240102-000000001.parquet", [("U", 2, 202)]
    )
    real_commit = wh.commit_group_linked

    def crash_flip(*a, **kw):
        raise RuntimeError("injected crash before the group flip")

    wh.commit_group_linked = crash_flip
    try:
        q2 = start_cdc_group_stream(
            spark,
            members,
            wh,
            group="sync",
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        with pytest.raises(Exception, match="injected crash"):
            q2.awaitTermination(180)
            raise AssertionError("stream should have failed")
    finally:
        wh.commit_group_linked = real_commit
    # working tables may already carry epoch 2, but the GROUP still
    # resolves epoch 1 for BOTH members — never one new + one old
    snap = wh.read_group(spark, "sync")
    assert {
        r.id: (r.name, r.val) for r in snap["cust"].collect()
    } == epoch1_cust
    assert {r.oid: r.amt for r in snap["ord"].collect()} == epoch1_ord

    # restart: the checkpoint replays epoch 2 (merges are idempotent)
    # and the group advances for all members together
    q3 = start_cdc_group_stream(
        spark,
        members,
        wh,
        group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q3.awaitTermination(180)
    snap = wh.read_group(spark, "sync")
    assert {r.id: (r.name, r.val) for r in snap["cust"].collect()}[2] == (
        "bobby",
        22.0,
    )
    assert {r.oid: r.amt for r in snap["ord"].collect()}[2] == 202
    # and the snapshot equals the working tables (nothing lost/dupped)
    assert {
        r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
    } == {r.id: (r.name, r.val) for r in snap["cust"].collect()}


def test_group_stream_epoch_with_pending_deletes(spark, tmp_path):
    """A member has pending merge-on-read deletes mid-epoch (the
    defer-mode GDPR queue): the epoch's merge FOLDS the pending set
    (re-inserted key wins, others stay masked), the group snapshot
    CARRIES the remaining sidecar instead of refusing, and the carried
    snapshot stays masked even after the live table materializes —
    including across a crash-before-flip replay."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    cust_landing, ord_landing, members = _seed(spark, wh, tmp_path)
    # grow cust so it spans several files (the fold's scoped paths need
    # something to carry) and take two deferred deletes on it
    wh.overwrite(
        spark.range(2000).selectExpr(
            "id", "concat('n-', id) AS name", "cast(id AS double) AS val"
        ).repartition(8, "name"),
        "cust",
    )
    wh.delete_keys(spark, "cust", "id", [10, 20])

    # epoch 1: re-insert id 10 (CDC must win over the stale tombstone)
    _write_csv(
        cust_landing / "20240101-000000001.csv", [("I", 10, "back", 1.0)]
    )
    _write_parquet(
        ord_landing / "20240101-000000001.parquet", [("U", 1, 101)]
    )
    q = start_cdc_group_stream(
        spark,
        members,
        wh,
        group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    got = {r.id: r.name for r in wh.read(spark, "cust").collect()}
    assert got[10] == "back" and 20 not in got
    dm = wh.pending_deletes("cust")
    assert dm is not None and dm["n_keys"] == 1
    snap = wh.read_group(spark, "sync")
    snap_ids = {r.id for r in snap["cust"].collect()}
    assert 10 in snap_ids and 20 not in snap_ids

    # epoch 2 merges but the flip crashes; the group must still resolve
    # epoch 1 — with epoch 1's carried mask intact
    _write_csv(
        cust_landing / "20240102-000000001.csv", [("U", 1, "alice9", 12.0)]
    )
    _write_parquet(
        ord_landing / "20240102-000000001.parquet", [("U", 2, 202)]
    )
    real_commit = wh.commit_group_linked

    def crash_flip(*a, **kw):
        raise RuntimeError("injected crash before the group flip")

    wh.commit_group_linked = crash_flip
    try:
        q2 = start_cdc_group_stream(
            spark, members, wh, group="sync",
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        with pytest.raises(Exception, match="injected crash"):
            q2.awaitTermination(180)
            raise AssertionError("stream should have failed")
    finally:
        wh.commit_group_linked = real_commit
    snap = wh.read_group(spark, "sync")
    snap_cust = {r.id: r.name for r in snap["cust"].collect()}
    assert snap_cust.get(10) == "back" and 20 not in snap_cust
    assert 1 in {r.oid for r in snap["ord"].collect()}

    # restart replays epoch 2; the group advances; key 20 still masked
    q3 = start_cdc_group_stream(
        spark, members, wh, group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q3.awaitTermination(180)
    snap = wh.read_group(spark, "sync")
    snap_cust = {r.id: r.name for r in snap["cust"].collect()}
    assert snap_cust[1] == "alice9" and 20 not in snap_cust
    assert snap_cust[10] == "back"

    # the live table materializes; the RETAINED snapshot keeps its own
    # sidecar (hard links survive the live table's cleanup)
    wh.materialize_deletes(spark, "cust")
    assert wh.pending_deletes("cust") is None
    snap = wh.read_group(spark, "sync")
    assert 20 not in {r.id for r in snap["cust"].collect()}


def test_group_stream_maintenance_hook(spark, tmp_path):
    """The group stream runs the bounded advisor pass after the epoch
    commit: a member's aged deferred deletes are materialized BY THE
    STREAM, while the snapshot taken at the epoch boundary had carried
    the still-pending sidecar (and stays masked)."""
    from example_dms_dataexport_spark.maintenance import MaintenancePolicy

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    cust_landing, ord_landing, members = _seed(spark, wh, tmp_path)
    wh.overwrite(
        spark.range(400).selectExpr(
            "id", "concat('n-', id) AS name", "cast(id AS double) AS val"
        ).repartition(4, "name"),
        "cust",
    )
    wh.delete_keys(spark, "cust", "id", [10, 20])
    _write_csv(
        cust_landing / "20240101-000000001.csv", [("I", 10, "back", 1.0)]
    )
    _write_parquet(
        ord_landing / "20240101-000000001.parquet", [("U", 1, 101)]
    )
    q = start_cdc_group_stream(
        spark, members, wh, group="sync",
        checkpoint_dir=str(tmp_path / "ckpt"),
        maintenance=MaintenancePolicy(max_delete_age_s=0.0),
        maintenance_every=1,
    )
    q.awaitTermination(180)
    got = {r.id: r.name for r in wh.read(spark, "cust").collect()}
    assert got[10] == "back" and 20 not in got
    # the stream's post-commit maintenance materialized the remainder
    assert wh.pending_deletes("cust") is None
    raw = {r.id for r in spark.read.parquet(wh.path("cust")).collect()}
    assert 20 not in raw
    # the epoch snapshot still resolves (carried sidecar or already-
    # materialized members both read masked)
    snap = wh.read_group(spark, "sync")
    snap_ids = {r.id for r in snap["cust"].collect()}
    assert 10 in snap_ids and 20 not in snap_ids


def test_group_stream_replayed_epoch_skips_with_zero_io(spark, tmp_path):
    """The zero-I/O re-delivery early-exit on the group-commit path
    (r20, the CDC loader's last_merged_file pattern): a crash between
    the group flip and the streaming checkpoint commit re-delivers the
    epoch, and the guard — the (lineage, batch_id) marker committed
    atomically WITH the flip — skips every member merge AND the
    snapshot: merge_and_write is never invoked and the group commit
    number does not double-bump."""
    import os

    from example_dms_dataexport_spark.streaming import cdc_stream as CS

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    cust_landing, ord_landing, members = _seed(spark, wh, tmp_path)
    _write_csv(
        cust_landing / "20240101-000000001.csv", [("U", 1, "alice2", 11.0)]
    )
    _write_parquet(
        ord_landing / "20240101-000000001.parquet", [("U", 1, 101)]
    )

    calls = []
    real_merge = CS.merge_and_write

    def counting_merge(*a, **kw):
        calls.append(1)
        return real_merge(*a, **kw)

    CS.merge_and_write = counting_merge
    try:
        ckpt = str(tmp_path / "ckpt")
        q = start_cdc_group_stream(
            spark, members, wh, group="sync", checkpoint_dir=ckpt
        )
        q.awaitTermination(180)
        n_calls = len(calls)
        assert n_calls == 2  # one merge per member
        commit_before = wh._load_group("sync")["current"]
        gm = wh.group_meta("sync")
        assert gm["last_batch_id"] == 0
        assert os.path.realpath(gm["checkpoint"]) == os.path.realpath(ckpt)
        state_cust = {
            r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
        }

        # crash AFTER the flip, BEFORE the checkpoint commit: the epoch
        # re-delivers, the guard skips it entirely
        commits = os.path.join(ckpt, "commits")
        latest = sorted(
            f for f in os.listdir(commits) if not f.startswith(".")
        )[-1]
        os.remove(os.path.join(commits, latest))
        crc = os.path.join(commits, f".{latest}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        q2 = start_cdc_group_stream(
            spark, members, wh, group="sync", checkpoint_dir=ckpt
        )
        q2.awaitTermination(180)
        assert len(calls) == n_calls  # no member merge re-ran
        assert wh._load_group("sync")["current"] == commit_before  # no bump
        assert {
            r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
        } == state_cust

        # fresh lineage: batch ids restart at 0 — the marker must NOT
        # match and the epoch replays (idempotent) instead of skipping
        q3 = start_cdc_group_stream(
            spark, members, wh, group="sync",
            checkpoint_dir=str(tmp_path / "ckpt2"),
        )
        q3.awaitTermination(180)
        assert len(calls) == n_calls + 2
        assert {
            r.id: (r.name, r.val) for r in wh.read(spark, "cust").collect()
        } == state_cust
    finally:
        CS.merge_and_write = real_merge
