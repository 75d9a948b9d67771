"""Parquet warehouse — the target-table store (Snowflake-side analogue).

The reference's targets are Snowflake tables written by COPY INTO / MERGE.
Here a warehouse is a directory of parquet tables with two write modes:

- ``overwrite``: atomic full replace — same idempotency contract as the
  reference's TRUNCATE + COPY INTO (ref :238-243); re-running a full load
  can never leave a partial table.
- ``overwrite_partitions``: dynamic partition overwrite — only partitions
  present in the incoming DataFrame are replaced (needs
  ``spark.sql.sources.partitionOverwriteMode=dynamic``, set in session.py).
  This is the 100 TB path for CDC rewrites: partition the target by a
  stable coarse key (e.g. date or pk-bucket) and a CDC batch rewrites only
  touched partitions (SURVEY §7.3 hard-part a).

The read→merge→overwrite cycle on one table would otherwise race with
itself (Spark reads lazily while the job overwrites the same files), so
``overwrite`` writes to a temp directory first and atomically swaps
(SURVEY §7.3 hard-part b).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetWarehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def overwrite(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> None:
        """Full atomic replace: materialize to temp dir, swap, drop old."""
        final = self.path(table)
        tmp = os.path.join(self.root, f".tmp-{table}-{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        old = None
        if os.path.exists(final):
            old = os.path.join(self.root, f".old-{table}-{uuid.uuid4().hex}")
            os.replace(final, old)
        os.replace(tmp, final)
        if old:
            shutil.rmtree(old, ignore_errors=True)

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_by: list[str]
    ) -> None:
        """Dynamic partition overwrite — rewrites only touched partitions.

        Safe without the temp-swap only when the incoming partitions were
        fully materialized before the write begins (Spark stages output to
        ``_temporary`` and commits per-partition); for a CDC merge whose
        input *reads* the same table, callers should persist/checkpoint the
        merged result first or use ``overwrite``.
        """
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path(table))
        )

    def replace_partitions(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str],
        touched: list[tuple],
    ) -> None:
        """Partition-scoped replace for a merge result restricted to
        ``touched`` partition-value tuples.

        Dynamic overwrite only rewrites partitions PRESENT in ``df`` — a
        CDC batch that deletes every row of a partition leaves the stale
        directory behind. So: write dynamically, then drop the directories
        of touched partitions that the merge emptied (hive-style
        ``col=value`` paths). The untouched partitions' files are never
        read or written.
        """
        still_present = {
            tuple(r[c] for c in partition_by)
            for r in df.select(*partition_by).distinct().collect()
        }
        self.overwrite_partitions(df, table, partition_by)
        for vals in touched:
            if tuple(vals) not in still_present:
                d = self.path(table)
                for c, v in zip(partition_by, vals):
                    d = os.path.join(d, f"{c}={v}")
                shutil.rmtree(d, ignore_errors=True)
