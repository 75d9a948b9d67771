"""incremental_load analogue (ref :271-428) — the pipeline's crown jewel.

Reference flow → Spark mapping:

1. metadata fetch incl. watermark + primary_keys (ref :277-299)
   → MetadataStore.get
2. CDC file pattern ``.*/<schema>/<table>/2.*\\.csv`` (ref :301)
   → regex over the stage listing
3. new-files check ``max(metadata$filename) > watermark`` (ref :358-367)
   → driver-side: prune the *file list* by lexicographic watermark before
     any Spark read is planned.  The reference pushes the filter into the
     stage scan; pruning the listing is the same optimization one level
     earlier (SURVEY §4 — the biggest 100 TB lever), and the early-exit
     "No files to process." (ref :421-423) falls out for free.
4. schema introspection + positional casts (ref :307-348)
   → target schema applied in the CSV read (sources/csv_stage.py)
5. latest-wins dedup + MERGE (ref :369-409)
   → merge.apply_changes: max_by latest-wins dedup + full-outer join
6. advance watermark to max processed file (ref :412-416)
   → MetadataStore.update_watermarks, after the write commits
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .listing import list_stage
from .merge import apply_changes
from .metadata import MetadataStore, source_ordered
from .sources.csv_stage import cdc_schema
from .sources.stage import read_stage, stage_extension
from .sources.warehouse import ParquetWarehouse

# ref :301 — CDC files start with '2' (2YYYYMMDD-nnnnnnnnn.<ext>); the
# extension follows the table's metadata file_format (ref :26).
CDC_PATTERN = r".*/{schema}/{table}/2.*\.{ext}"


def incremental_load(
    spark: SparkSession,
    store: MetadataStore,
    warehouse: ParquetWarehouse,
    full_path: str,
    partition_by: list[str] | None = None,
    schema: StructType | None = None,
) -> str:
    """Apply all CDC files newer than the watermark; returns a status
    string shaped like the reference's returns (ref :418-426).

    ``schema``: additive schema evolution. When the source grows a column
    the CDC files carry an extra positional field the stored target
    doesn't have; pass the EVOLVED target schema and the load reads the
    files against it while back-filling the new columns as NULL on the
    existing rows (the merge then writes the evolved layout). Columns may
    only be added — a schema missing stored columns raises rather than
    silently dropping data.
    """
    meta = store.get(full_path)
    if meta is None:
        return "Specified full_path doesn't exist in dms_metadata table."
    if not meta.stage or not meta.primary_keys:
        return "The fields stage and primary_keys can't be null"  # ref :303-305
    layout = meta.layout()
    if partition_by is None:  # declared layout drives the partition scoping
        partition_by = layout.get("partition_by")

    pattern = CDC_PATTERN.format(
        schema=meta.db_schema,
        table=meta.db_table,
        ext=stage_extension(meta.file_format),
    )
    all_cdc = list_stage(spark, meta.stage, pattern)
    # Watermark compares *file names* lexicographically (ref :359,393) —
    # DMS names encode time as 2YYYYMMDD-nnnnnnnnn so name order = time
    # order; the full-load sentinel '0' sorts before every CDC file.
    new_files = [
        f.path
        for f in all_cdc
        if f.path.rsplit("/", 1)[-1] > meta.last_incremental_file
    ]
    if not new_files:
        return "No files to process."  # ref :421-423

    target = warehouse.read(spark, meta.target_table)
    evolved = False
    if schema is not None:
        dropped = [c for c in target.columns if c not in schema.fieldNames()]
        if dropped:
            raise ValueError(
                f"schema evolution is additive-only; missing stored columns: "
                f"{dropped}"
            )
        for f_ in schema.fields:
            if f_.name not in target.columns:
                target = target.withColumn(
                    f_.name, F.lit(None).cast(f_.dataType)
                )
                evolved = True
        target = target.select(*schema.fieldNames())
        read_schema = schema
    else:
        if meta.column_order:
            # the positional CDC cast follows the SOURCE order recorded
            # at full load — a partitioned target's schema reads back
            # partition-columns-last, which would garble the cast
            target = target.select(
                *source_ordered(target.columns, meta.column_order)
            )
        read_schema = target.schema
    changes = read_stage(
        spark,
        new_files,
        cdc_schema(read_schema),
        file_format=meta.file_format,
        with_file_metadata=True,
    )
    version_cols = ["_dms_filename", "_dms_rownum"]  # ref :382 total order

    n = merge_and_write(
        warehouse,
        meta.target_table,
        target,
        changes,
        pks=meta.primary_keys,
        version_cols=version_cols,
        partition_by=partition_by,
        # An evolution batch must not be partition-scoped: rewriting only
        # touched partitions would leave untouched partition dirs on the
        # OLD parquet layout, and a later plain read (mergeSchema off) can
        # resolve the table schema from an old-layout footer — silently
        # losing the new column. Force the one-time full rewrite.
        full_rewrite=evolved,
        layout=layout,
    )

    last_file = max(f.rsplit("/", 1)[-1] for f in new_files)
    if schema is not None:  # evolution: the new order is authoritative
        store.update_column_order(full_path, schema.fieldNames())
    store.update_watermarks(full_path, last_incremental_file=last_file)
    return f"Rows affected: {n}."


def merge_and_write(
    warehouse: ParquetWarehouse,
    target_table: str,
    target,
    changes,
    pks: list[str],
    version_cols: list[str],
    partition_by: list[str] | None = None,
    full_rewrite: bool = False,
    layout: dict | None = None,
) -> int:
    """MERGE ``changes`` into ``target`` and commit to ``target_table``;
    returns the written row count. ONE code path for the merge+write,
    shared by the batch loader and the streaming foreachBatch driver.

    ``layout`` (``TableMeta.layout()``) re-applies the table's declared
    clustering / zone-map options whenever the write is a FULL rewrite,
    so a reload or evolution batch lands read-optimized. The
    partition-scoped path deliberately ignores the clustering options: a
    global range-cluster would shuffle the whole table — exactly what
    partition scoping exists to avoid — and the zone map is dropped by
    ``replace_partitions`` (rebuild with ``write_zonemap`` after a
    compaction cycle).

    With ``partition_by`` the merge is partition-scoped — the 100 TB path
    (SURVEY §7.3a): partition columns must be stable per PK (a pk-derived
    bucket or immutable date), so a change only touches its own
    partition, the target scan is partition-pruned to the batch's
    partitions, and the rewrite is proportional to the CDC batch, not
    the table.

    ``full_rewrite`` disables the partition-scoped path for one batch
    while KEEPING the hive partition layout on disk — the schema-
    evolution case, where every partition dir must be rewritten to the
    evolved layout so no reader can resolve the table schema from a
    stale old-layout footer.
    """
    if partition_by and not full_rewrite:
        touched = [
            tuple(r[c] for c in partition_by)
            for r in changes.select(*partition_by).distinct().collect()
        ]
        # One struct-IN predicate, not an OR-chain of equality conjunctions:
        # thousands of touched partitions would otherwise build a huge
        # expression tree that slows analysis/codegen. Catalyst converts
        # this to a single INSET and it still lands in PartitionFilters
        # (verified by tests/test_partitioned_cdc.py), so the target scan
        # stays partition-pruned. Literal fields are aliased+cast to the
        # target's column names/types so the struct types unify.
        # A NULL inside a tuple would make struct-IN evaluate to NULL and
        # silently exclude that partition's target rows from the merge while
        # replace_partitions still rewrites it — so NULL-bearing tuples get
        # a null-safe eqNullSafe conjunction instead (rare: partition
        # columns are normally non-null by construction).
        non_null = [vals for vals in touched if all(v is not None for v in vals)]
        with_null = [vals for vals in touched if any(v is None for v in vals)]
        pred = F.lit(False)
        if non_null:
            pred = F.struct(*partition_by).isin(
                [
                    F.struct(
                        *[
                            F.lit(v).cast(target.schema[c].dataType).alias(c)
                            for c, v in zip(partition_by, vals)
                        ]
                    )
                    for vals in non_null
                ]
            )
        for vals in with_null:
            conj = F.lit(True)
            for c, v in zip(partition_by, vals):
                conj = conj & F.col(c).eqNullSafe(
                    F.lit(v).cast(target.schema[c].dataType)
                )
            pred = pred | conj
        merged = apply_changes(
            target.filter(pred),  # partition-pruned scan
            changes,
            pks=pks,
            version_cols=version_cols,
        )
        merged = merged.persist()
        n = merged.count()  # materialize before overwriting what we read
        warehouse.replace_partitions(merged, target_table, partition_by, touched)
        merged.unpersist()
    else:
        merged = apply_changes(
            target, changes, pks=pks, version_cols=version_cols
        ).persist()
        n = merged.count()  # materialization also validates before the swap
        # full_rewrite keeps the partition layout: the atomic whole-table
        # swap also drops any pending tombstone marker with the old dir.
        lay = layout or {}
        warehouse.overwrite(
            merged,
            target_table,
            partition_by=partition_by,
            cluster_by=lay.get("cluster_by"),
            zorder_by=lay.get("zorder_by"),
            cluster_partitions=lay.get("cluster_partitions"),
            stat_cols=lay.get("stat_cols"),
        )
        merged.unpersist()
    return n
