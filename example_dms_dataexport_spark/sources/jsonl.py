"""JSON-lines source — the landing format document/event corpora usually
arrive in (one JSON object per line, gz-chunked at scale).

Same stance as the CSV stage reader: NO schema inference. Inference
needs an extra full pass over the data and silently widens/narrows types
between batches; a 100 TB ingest declares its schema once (or
introspects the target table, as the reference does for CSVs at
control_migration_schema_script.sql:341-348) and lets corrupt records
land in a quarantine column instead of failing the job.

- explicit ``StructType`` applied at read: column pruning pushes into
  the JSON parser (Jackson only materializes requested fields);
- PERMISSIVE mode with ``_corrupt`` capture: bad lines become one
  non-null ``_corrupt`` row — count them, don't crash the load;
- ``multiLine`` stays False: line-delimited JSON is splittable, so one
  large file still fans out across executors (a multiline JSON array
  is a single-split scan — never land data that way).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read line-delimited JSON under an explicit schema.

    Rows that fail to parse are dropped by default; with
    ``keep_corrupt=True`` they are kept with every data column NULL and
    the raw line in ``_corrupt`` (quarantine-table pattern).
    """
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    read_schema = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
    shuffle_by: list[str] | None = None,
    n_tasks: int | None = None,
    compression: str = "gzip",
) -> dict:
    """Export a corpus as size-bounded gzipped JSON-lines shards plus an
    atomically-committed ``_manifest.json`` — the other hand-off format
    training loaders consume (``warehouse.write_shards`` is the parquet
    twin; this one is for loaders that stream text records, not columnar
    readers).

    Same contracts as the parquet exporter:

    - ``shuffle_by``: deterministic decorrelation — hash-partition on
      ``xxhash64(shuffle_by)`` into a FIXED ``n_tasks`` count, sorted
      within each partition, so the same input always produces the same
      shard contents (``ORDER BY rand()`` and ``repartitionByRange``
      both re-randomize between runs). The within-partition sort key is
      ``(_shuffle_key, shuffle_by..., xxhash64(all columns))`` — the
      full-row hash tie-break makes the order total even when
      ``shuffle_by`` is not a unique key (rows tying on every sort key
      are full duplicates, hence interchangeable), mirroring
      ``ordering.global_index``'s strict-total-order requirement;
    - ``maxRecordsPerFile`` bounds each shard without another exchange;
    - shards + manifest land in a temp directory and promote via one
      atomic rename, so a crashed export can never be half-consumed.
      When ``path`` already exists the promotion is two renames (old
      aside, then tmp in) — POSIX has no atomic non-empty-directory
      swap — so there is a brief window with no directory at ``path``:
      the exporter requires a SINGLE WRITER, ENFORCED by an ``O_EXCL``
      lock beside ``path`` (a second concurrent export raises
      :class:`~.warehouse.ConcurrentWriteError` instead of interleaving
      renames), and assumes no reader concurrent with a re-export of
      the same path (readers of a live corpus should consume versioned
      paths or ``warehouse.overwrite_versioned`` instead).

    gzip (default) keeps shards splittable-enough in practice because
    the FILE is the work unit (one shard = one loader task); within a
    shard the stream is sequential anyway.
    """
    import uuid

    from pyspark.sql import functions as F

    from .warehouse import ConcurrentWriteError

    parent0 = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent0, exist_ok=True)
    lock = os.path.join(
        parent0, f".lock-jsonl-{os.path.basename(os.path.abspath(path))}"
    )
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"jsonl export to {path!r} is already running (lock: {lock}). "
            "If that exporter crashed, remove the lock file manually."
        ) from None
    os.write(fd, f"pid={os.getpid()}".encode())
    os.close(fd)
    try:
        return _write_jsonl_shards_locked(
            df, path, max_records_per_file, shuffle_by, n_tasks, compression
        )
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def _write_jsonl_shards_locked(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    shuffle_by: list[str] | None,
    n_tasks: int | None,
    compression: str,
) -> dict:
    import uuid

    from pyspark.sql import functions as F

    if shuffle_by:
        key = F.xxhash64(*[F.col(c) for c in shuffle_by])
        n = n_tasks or df.sparkSession.sparkContext.defaultParallelism
        row_tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
        df = (
            df.withColumn("_shuffle_key", key)
            .repartition(n, "_shuffle_key")
            .sortWithinPartitions("_shuffle_key", *shuffle_by, row_tiebreak)
            .drop("_shuffle_key")
        )
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".tmp-jsonl-{uuid.uuid4().hex}")
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if compression:
        w = w.option("compression", compression)
    w.json(tmp)
    # per-shard row counts, computed DISTRIBUTED (line count grouped by
    # input file) — the parquet twin reads footer metadata; JSONL has no
    # footer, and a driver-side re-read of every shard would not survive
    # a 100 TB export
    counts = {
        os.path.basename(r["f"]): r["rows"]
        for r in (
            df.sparkSession.read.text(tmp)
            .select(F.input_file_name().alias("f"))
            .groupBy("f")
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
    }
    shards = [
        {
            "file": name,
            "rows": int(counts.get(name, 0)),
            "bytes": os.path.getsize(os.path.join(tmp, name)),
        }
        for name in sorted(os.listdir(tmp))
        if name.startswith("part-")
    ]
    manifest = {
        "path": os.path.basename(path),
        "n_shards": len(shards),
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(tmp, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(path):
        old = os.path.join(parent, f".old-jsonl-{uuid.uuid4().hex}")
        os.replace(path, old)
        shutil.rmtree(old, ignore_errors=True)
    os.replace(tmp, path)
    return manifest
