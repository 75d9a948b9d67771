"""Task-DAG analogue (ref :163-203, :494-552): orchestrate the loads.

Reference: a scheduled root task runs the planner, then 5 child tasks each
loop claim-one-item / DELETE / dispatch on load type (B → full then
incremental, ref :191-193; F → full; I → incremental) until the queue is
empty.  The claim-then-delete there is not atomic (ref E2 boundary note);
tasks avoid races only via disjoint ``task_in_charge`` assignment.

Here: one Spark application, a thread-safe ``queue.Queue``, and a
``ThreadPoolExecutor`` — Spark's scheduler is thread-safe, so N workers
submit independent jobs that run concurrently in the one cluster, and
Spark additionally parallelizes *within* each table load (the reference
cannot).  FAIR scheduling keeps one giant table from starving the rest.
"""

from __future__ import annotations

import queue
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from .cdc import incremental_load
from .full_load import full_load
from .metadata import MetadataStore
from .planner import WorkItem, prepare_migration_queue
from .sources.warehouse import ParquetWarehouse


@dataclass
class RunResult:
    processed: list[tuple[str, str, str]] = field(default_factory=list)  # (path, type, status)
    errors: list[tuple[str, str]] = field(default_factory=list)
    group_commit: int | None = None  # set when run_queue(group=...) published
    maintenance: list[dict] = field(default_factory=list)  # post-cycle advisor actions


def run_migration(
    spark: SparkSession,
    store: MetadataStore,
    warehouse: ParquetWarehouse,
    schemas: dict[str, StructType] | None = None,
    task_count: int = 5,
    maintenance=None,
) -> RunResult:
    """Plan + execute one migration round (root task + children, ref :494-552)."""
    items = prepare_migration_queue(spark, store, task_count=task_count)
    return run_queue(
        spark, store, warehouse, items, schemas, task_count,
        maintenance=maintenance,
    )


def run_queue(
    spark: SparkSession,
    store: MetadataStore,
    warehouse: ParquetWarehouse,
    items: list[WorkItem],
    schemas: dict[str, StructType] | None = None,
    task_count: int = 5,
    retries: int = 0,
    backoff_s: float = 1.0,
    group: str | None = None,
    maintenance=None,
) -> RunResult:
    """Drain the work queue with ``task_count`` workers.

    ``maintenance``: a :class:`~.maintenance.MaintenancePolicy` — after
    the cycle (and its group commit, when any) lands, one BOUNDED
    advisor-driven maintenance pass runs over the cycle's target tables
    (aged pending deletes materialize, drifted layouts recluster,
    small-file debt compacts; at most ``max_actions_per_cycle`` actions).
    The decisions land in ``RunResult.maintenance``; a maintenance
    failure never fails the cycle. This is the task-DAG's automated
    maintenance slot (ref :494-538) — the advisors are metadata-only, so
    the check itself is free even at 100 TB.

    ``retries``: per-item re-attempts after a failure (the reference's
    scheduled tasks get this for free — a failed item stays in the DMS
    queue table and the next tick re-claims it; here the requeue is
    explicit). Attempt n waits ``backoff_s * 2^(n-1)`` first, idempotency
    is what the loads already guarantee (atomic overwrite / un-advanced
    watermark), and only the final failure lands in ``errors``.

    ``group``: consistent CYCLE snapshots — something the reference's
    task DAG cannot offer (each Snowflake MERGE commits independently,
    so a reader joining two tables mid-cycle sees one table's new state
    against the other's old). When set, the cycle's target tables are
    published as ONE group commit via ``commit_group_linked`` after
    every worker drains: hard links, zero data I/O, pointer flip at the
    cycle boundary. Readers who resolve ``warehouse.read_group(group)``
    see whole cycles only — mid-cycle they keep the previous commit.
    Every queued item's target table joins the snapshot (an item that
    errored simply contributes its pre-cycle state, which is still a
    coherent boundary); ``RunResult.group_commit`` carries the commit
    number, or None when no item had a loadable target.
    """
    q: queue.Queue[tuple[WorkItem, int]] = queue.Queue()
    for it in items:
        if it.load_type != "N":
            q.put((it, 0))
    result = RunResult()

    def worker() -> None:
        # claim loop (ref :173-200); Queue.get_nowait is the atomic
        # claim+delete the reference approximates with LIMIT 1 + DELETE.
        # Local properties are per-thread: the pool must be set HERE, in
        # the worker thread, for FAIR scheduling to group its jobs.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "dms")
        while True:
            try:
                it, attempt = q.get_nowait()
            except queue.Empty:
                return
            try:
                if attempt:
                    time.sleep(backoff_s * (2 ** (attempt - 1)))
                # QUERY_TAG analogue (ref :225,281,540-544): every job a
                # load submits is tagged with its table + load type, so a
                # hung load is findable in the Spark UI / REST API by
                # full_path — setJobGroup is per-thread, like the pool.
                spark.sparkContext.setJobGroup(
                    it.full_path, f"dms load_type={it.load_type} {it.full_path}"
                )
                schema = (schemas or {}).get(it.full_path)
                if it.load_type in ("B", "F"):
                    n = full_load(spark, store, warehouse, it.full_path, schema)
                    result.processed.append((it.full_path, "F", f"Rows loaded: {n}."))
                if it.load_type in ("B", "I"):  # B = full then incremental, ref :191-193
                    msg = incremental_load(spark, store, warehouse, it.full_path)
                    result.processed.append((it.full_path, "I", msg))
            except Exception as e:  # noqa: BLE001 — per-item isolation
                if attempt < retries:
                    q.put((it, attempt + 1))
                else:
                    result.errors.append((it.full_path, repr(e)))
            finally:
                q.task_done()

    with ThreadPoolExecutor(max_workers=task_count) as ex:
        for _ in range(task_count):
            ex.submit(worker)
    cycle_metas = {
        meta.target_table: meta
        for it in items
        if it.load_type != "N"
        and (meta := store.get(it.full_path)) is not None
        and meta.target_table
    }
    if group is not None:
        cycle_targets = set(cycle_metas)
        # a target with no committed plain-table state yet — its FIRST
        # load failed this cycle, or it uses a versioned layout — joins
        # the group once it has one; snapshotting it now would crash
        # the commit and discard the whole cycle's RunResult
        cycle_targets = {
            t for t in cycle_targets if warehouse.has_committed_data(t)
        }
        # a cycle that touches only a subset still snapshots every
        # existing member at its (unchanged) current state — member
        # sets never shrink, and the commit stays a whole-group
        # boundary
        targets = sorted(cycle_targets | set(warehouse.group_members(group)))
        if targets:
            result.group_commit = warehouse.commit_group_linked(
                targets, group
            )
    if maintenance is not None:
        from .maintenance import run_maintenance

        candidates = [
            t for t in cycle_metas if warehouse.has_committed_data(t)
        ]
        result.maintenance = run_maintenance(
            spark,
            warehouse,
            candidates,
            policy=maintenance,
            layouts={t: m.layout() for t, m in cycle_metas.items()},
        )
    return result
