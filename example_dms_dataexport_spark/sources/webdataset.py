"""WebDataset-style tar-shard export/ingest — the multimodal hand-off
format (one tar per shard; entries ``<key>.<ext>`` sharing a basename
form one training sample; loaders stream tars sequentially).

This is the public WebDataset convention (Aizman et al., "High
Performance I/O For Large Scale Deep Learning"; the webdataset library
consumes exactly this layout). The parquet shard exporter
(``warehouse.write_shards``) hands off columnar data; this one hands
off SAMPLES — raw bytes per modality entry — which is what image/audio
training loaders actually mount.

Spark-first shape: shard assignment is the engine's reproducible-
shuffle discipline (``pmod(xxhash64(key), n_shards)`` — same input,
same shards, no per-run randomness), one repartition co-locates each
shard's samples, and each task streams ITS tar with the stdlib
``tarfile`` writer via ``mapInPandas`` (Arrow-batched; bytes never
gather on the driver). Tar entries are canonicalized (mtime 0, uid/gid
0, sorted by key within the shard) so exports are BYTE-deterministic —
re-exports of the same corpus are bitwise-identical shards (pinned).
The whole export stages into a temp dir and commits by one atomic
rename, manifest included, like every warehouse writer.

Column encoding: ``binary`` entries ship raw; ``string`` entries ship
UTF-8; anything else ships compact JSON. NULL skips the entry (the
sample simply lacks that modality), and a NULL/duplicate KEY refuses
loudly — silent key collisions would merge two samples into one.

Local-filesystem staging note: executors write tars under the staging
dir directly, which is correct on a shared/local FS (this deployment)
— an object-store deployment would route the same bytes through a
task-committer sink instead.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WDS_MANIFEST = "_manifest.json"


def _entry_bytes(val, ext: str) -> bytes | None:
    if val is None:
        return None
    if isinstance(val, (bytes, bytearray)):
        return bytes(val)
    if isinstance(val, str):
        return val.encode("utf-8")
    return json.dumps(val, sort_keys=True, separators=(",", ":")).encode(
        "utf-8"
    )


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    columns: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 8,
) -> dict:
    """Export ``df`` as ``shard-NNNNNN.tar`` files under ``out_dir``
    plus a ``_manifest.json``; returns the manifest dict.

    ``columns`` maps column name -> tar entry extension (e.g.
    ``{"image": "jpg", "text": "txt", "meta": "json"}``). Keys render
    as strings; each sample's entries appear consecutively in key
    order, per the WebDataset contract.
    """
    if not columns:
        raise ValueError("columns must map at least one column to an extension")
    cols = list(columns)
    missing = [c for c in [key_col, *cols] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    exts = dict(columns)
    key_s = F.col(key_col).cast("string")

    nulls = df.filter(key_s.isNull()).limit(1).count()
    if nulls:
        raise ValueError("NULL sample keys are refused (entries need names)")

    staged = (
        df.select(key_s.alias("__key"), *cols)
        # hash-repartition on the key: same input -> same shard contents
        # (Spark's fixed-seed hash), co-locating each sample's row with
        # its shard's writer task
        .repartition(n_shards, "__key")
        .sortWithinPartitions("__key")
    )

    tmp = out_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)

    def _write(iterator):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(tmp, f"shard-{pid:06d}.tar")
        # Each ATTEMPT streams to its own temp name and renames into
        # place only on success: with speculative execution (or a
        # zombie first attempt racing its retry) two attempts of the
        # same partition would otherwise interleave writes into one
        # torn tar that the atomic dir-commit then publishes. The
        # rename loser simply overwrites the winner's byte-identical
        # output (the sort makes shard contents deterministic).
        part = os.path.join(
            tmp, f".shard-{pid:06d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        n = 0
        tf = None
        last_key = None
        try:
            for pdf in iterator:
                if tf is None and len(pdf):
                    tf = tarfile.open(part, "w")
                # positional tuples: itertuples renames leading-
                # underscore columns, so (key, col...) unpack by index
                for row in pdf.itertuples(index=False, name=None):
                    key = row[0]
                    if key == last_key:
                        raise ValueError(
                            f"duplicate sample key {key!r} — two rows "
                            "would merge into one sample"
                        )
                    last_key = key
                    wrote_entry = False
                    for i, c in enumerate(cols):
                        data = _entry_bytes(row[1 + i], exts[c])
                        if data is None:
                            continue
                        wrote_entry = True
                        ti = tarfile.TarInfo(name=f"{key}.{exts[c]}")
                        ti.size = len(data)
                        ti.mtime = 0
                        ti.uid = ti.gid = 0
                        ti.uname = ti.gname = ""
                        tf.addfile(ti, io.BytesIO(data))
                    if not wrote_entry:
                        # a sample with every mapped column NULL has no
                        # tar representation — counting it would make
                        # the manifest overcount what read_webdataset
                        # can reassemble (silent sample loss); refuse
                        # loudly like NULL/duplicate keys
                        raise ValueError(
                            f"sample {key!r} has NULL in every mapped "
                            "column — no tar entry to write; filter "
                            "such rows or map a non-NULL column"
                        )
                    n += 1
        except BaseException:
            if tf is not None:
                tf.close()
            # a failed/killed attempt must not leave its partial temp
            # file to be swept into the committed dir
            try:
                os.remove(part)
            except OSError:
                pass
            raise
        else:
            if tf is not None:
                tf.close()
        if n == 0:
            return iter(())
        os.replace(part, path)
        return iter(
            [
                pd.DataFrame(
                    {
                        "shard": [os.path.basename(path)],
                        "samples": [n],
                        "bytes": [os.path.getsize(path)],
                    }
                )
            ]
        )

    try:
        rows = (
            staged.mapInPandas(_write, "shard string, samples long, bytes long")
            .collect()
        )
    except Exception:
        # a failed export (duplicate key, task error) must not leave a
        # corpus-sized orphan staging dir next to the destination
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shards = sorted(
        ({"file": r["shard"], "samples": r["samples"], "bytes": r["bytes"]}
         for r in rows),
        key=lambda s: s["file"],
    )
    manifest = {
        "format": "webdataset",
        "key_col": key_col,
        "columns": exts,
        "n_shards": len(shards),
        "total_samples": sum(s["samples"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(tmp, WDS_MANIFEST), "w") as f:
        json.dump(manifest, f)
    if os.path.isdir(out_dir):
        import shutil

        displaced = out_dir.rstrip("/") + f".old-{uuid.uuid4().hex}"
        os.rename(out_dir, displaced)
        os.rename(tmp, out_dir)
        shutil.rmtree(displaced, ignore_errors=True)
    else:
        os.rename(tmp, out_dir)
    return manifest


def read_webdataset(
    spark: SparkSession, in_dir: str, columns: dict[str, str] | None = None
) -> DataFrame:
    """Reassemble samples from a webdataset dir: one row per sample with
    a ``__key`` string column plus one BINARY column per mapped entry
    (callers decode/cast per modality — ``decode('utf-8')`` via
    ``F.decode`` for text, the multimodal decoders for media).

    ``columns`` defaults to the manifest's mapping. Tars scan via
    ``binaryFile`` (distributed, one task per shard — the same
    parallelism the export wrote with) and untar in-memory per task;
    sample reassembly is per-tar by construction, so no shuffle.
    """
    if columns is None:
        with open(os.path.join(in_dir, WDS_MANIFEST)) as f:
            columns = json.load(f)["columns"]
    exts = dict(columns)
    by_ext = {v: k for k, v in exts.items()}
    if len(by_ext) != len(exts):
        raise ValueError(f"extensions must be unique per column: {exts}")

    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(in_dir, "shard-*.tar"))
        .select("path", "content")
    )

    schema = ", ".join(
        ["`__key` string"] + [f"`{c}` binary" for c in exts]
    )

    def _untar(iterator):
        import pandas as pd

        for pdf in iterator:
            for _, row in pdf.iterrows():
                samples: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                with tarfile.open(
                    fileobj=io.BytesIO(row["content"])
                ) as tf:
                    for ti in tf:
                        # foreign tars may carry dirs/symlinks, for
                        # which extractfile() returns None — skip them
                        if not ti.isfile():
                            continue
                        base, _, ext = ti.name.rpartition(".")
                        col = by_ext.get(ext)
                        if col is None:
                            continue
                        if base not in samples:
                            samples[base] = {}
                            order.append(base)
                        samples[base][col] = tf.extractfile(ti).read()
                if order:
                    yield pd.DataFrame(
                        {
                            "__key": order,
                            **{
                                c: [samples[k].get(c) for k in order]
                                for c in exts
                            },
                        }
                    )

    return files.mapInPandas(_untar, schema)
