"""Driver-side xxHash64 for integral values, bit-identical to Spark's
``xxhash64`` expression.

Bloom-manifest point lookups probe file bitmaps with the SAME hash the
build pass used (``F.xxhash64(col, lit(i))``). Computing those probe
hashes used to take one tiny Spark job per lookup (createDataFrame →
xxhash64 → collect) — pure fixed overhead on every ingest-stream batch
and every point lookup. For integral key columns the round-trip is
unnecessary: Spark hashes a long/int as one 8-/4-byte xxHash64 block
(`org.apache.spark.sql.catalyst.expressions.XXH64.hashLong/hashInt`,
itself the public xxHash64 algorithm, BSD — same provenance as the
pure-python snappy in ``sources/snappy_pure.py``), which vectorizes in
numpy uint64 arithmetic driver-side. Non-integral types keep the Spark
job; ``tests/test_xxh64.py`` pins bit-equality against ``F.xxhash64``
itself across the full value range, so drift is impossible to miss.

All arithmetic is wrapping 64-bit — numpy uint64 arrays wrap silently,
matching Java longs; results convert back to SIGNED ints because
callers index bloom bitmaps with Python ``%`` on Spark's signed hashes.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

# Spark's xxhash64 SQL function seed (XxHash64 default)
SPARK_SEED = 42

# type names (DataType.typeName()) hashed as a promoted 32-bit int vs a
# 64-bit long by Spark's interpreted/codegen hasher
INT_TYPES = {"byte", "short", "integer", "date"}
LONG_TYPES = {"long", "timestamp", "timestamp_ntz"}


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> (np.uint64(64) - rr))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(values: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashLong over a uint64 array (vectorized; seed may be an
    array for per-row chained seeds)."""
    h = seed + _P5 + np.uint64(8)
    k1 = _rotl(values * _P2, 31) * _P1
    h = h ^ k1
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(values: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashInt over a uint64 array holding 32-bit values
    zero-extended, exactly as Spark promotes int-typed inputs."""
    h = seed + _P5 + np.uint64(4)
    h = h ^ ((values & np.uint64(0xFFFFFFFF)) * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def chain_integral_hashes(
    rows: list[tuple], type_names: list[str], n_hashes: int
) -> list[list[int]] | None:
    """The ``[[xxhash64(*parts, lit(i)) for i in range(n_hashes)] for
    each row]`` matrix for integral part columns, without a Spark job.

    ``rows`` holds one tuple of Python ints per probe key; ``type_names``
    the Spark typeName() of each part column. Returns None when any type
    is non-integral or any value is None (Spark skips null children,
    making the chain row-dependent — the bounded fallback job handles
    those rare probes). Output hashes are SIGNED, like ``collect()`` of
    the expression."""
    names = [t.lower() for t in type_names]
    if not all(t in INT_TYPES or t in LONG_TYPES for t in names):
        return None
    # raw ints only: date/timestamp probes arrive as Python date/datetime
    # objects (and Spark skips NULL children, making the chain
    # row-dependent) — both take the bounded fallback job
    if any(
        not isinstance(v, int) or isinstance(v, bool)
        for row in rows
        for v in row
    ):
        return None
    if not rows:
        return []
    h = np.full(len(rows), SPARK_SEED, dtype=np.uint64)
    for j, t in enumerate(names):
        # int64 view → uint64 preserves two's complement, like Java
        col = np.array([row[j] for row in rows], dtype=np.int64).view(
            np.uint64
        )
        h = hash_long(col, h) if t in LONG_TYPES else hash_int(col, h)
    out = np.empty((len(rows), n_hashes), dtype=np.uint64)
    for i in range(n_hashes):
        # the seed literal is a 32-bit int literal in the expression
        out[:, i] = hash_int(np.full(len(rows), i, dtype=np.uint64), h)
    signed = out.view(np.int64)
    return [[int(signed[r, i]) for i in range(n_hashes)] for r in range(len(rows))]
