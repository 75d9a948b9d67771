"""Iterative k-means (Lloyd's algorithm) over an embedding column — the
centroid-training step that produces the coarse quantizer a real IVF index
(operators.simsearch.knn_ivf) prunes with.

Each iteration is two relational steps, both expressed as DataFrame ops:

- ASSIGN: every vector scores against all k centroids and keeps the
  nearest (squared-L2). Centroids are collected to the driver between
  iterations (k x dim doubles — the bounded per-round collect MLlib's
  KMeans also does) and embedded as literal arrays, so assignment is a
  pure per-row codegen'd projection: no join, no shuffle, and each
  iteration's plan stays flat instead of re-executing all earlier rounds
  (the quadratic-lineage trap of a chained-DataFrame formulation).
- UPDATE: member vectors are exploded to (cluster, dim, value) and
  averaged per (cluster, dim), then re-assembled into centroid arrays —
  one partial-aggregated shuffle per iteration, the only shuffle k-means
  pays.

Exactness (what lets q57 hash-compare a 2-iteration fit against a DuckDB
restatement): per-dimension values are rounded to fixed-point int64
BEFORE the mean's sum, so the aggregation is order-independent; distances
use a chunk-unrolled subtraction kernel whose association order the SQL
twin mirrors; argmin ties break on cluster id. Every centroid both
engines compute is therefore bit-identical, and so is every assignment.

100 TB notes: this is the textbook distributed k-means shape (what MLlib
does under the hood) — per-iteration cost is one broadcast-scored scan +
two shuffles of corpus-and-smaller relations; k and dim ride in the
broadcast. Driver-side iteration count is a small constant; each loop
extends the lazy plan, so for many iterations checkpoint the centroid
relation (k rows) — trivially cheap — rather than the corpus. Empty
clusters drop out (standard Lloyd's); seeding is the k lowest-id vectors
for determinism — swap in k-means|| sampling when quality matters more
than reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .simsearch import DOT_CHUNK, EMBED_DIM, as_double

MEAN_SCALE = 1_000_000  # fixed-point scale for order-independent means


def sqdist(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Chunk-unrolled squared L2 distance (same association order as the
    SQL twin, so both engines produce bit-identical doubles)."""
    chunks = []
    for c0 in range(0, dim, DOT_CHUNK):
        acc = None
        for i in range(c0 + 1, min(c0 + DOT_CHUNK, dim) + 1):
            d = F.element_at(a, i) - F.element_at(b, i)
            term = d * d
            acc = term if acc is None else acc + term
        chunks.append(acc)
    out = chunks[0]
    for ch in chunks[1:]:
        out = out + ch
    return out


def sql_sqdist(a: str, b: str, dim: int = EMBED_DIM) -> str:
    """DuckDB twin of ``sqdist``."""
    chunks = []
    for c0 in range(0, dim, DOT_CHUNK):
        terms = [
            f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
            for i in range(c0 + 1, min(c0 + DOT_CHUNK, dim) + 1)
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = f"({acc} + {t})"
        chunks.append(acc)
    out = chunks[0]
    for ch in chunks[1:]:
        out = f"({out} + {ch})"
    return out


def _assign(v: DataFrame, centroids: list[tuple[int, list[float]]], dim: int) -> DataFrame:
    """Nearest centroid per vector, with the k centroids embedded as
    LITERALS: assignment is a pure per-row projection — no join, no
    shuffle, whole-stage codegen'd. Ties break on cluster id via the
    (dist, cid) struct min."""
    best = F.least(
        *[
            F.struct(
                sqdist(F.col("_v"), F.array(*[F.lit(x) for x in cv]), dim).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, cv in centroids
        ]
    )
    return v.select(
        "vec_id",
        "_v",
        best.alias("_best"),
    ).select(
        "vec_id", "_v", F.col("_best.cid").alias("cid"), F.col("_best.d").alias("dist")
    )


def _update(assigned: DataFrame, dim: int) -> DataFrame:
    """Recompute centroids as per-dimension means in exact fixed-point."""
    e = assigned.select("cid", F.posexplode("_v").alias("_p", "_val")).select(
        "cid",
        (F.col("_p") + 1).alias("_d"),
        F.floor(F.col("_val") * MEAN_SCALE + F.lit(0.5)).cast("long").alias("_sv"),
    )
    means = e.groupBy("cid", "_d").agg(
        (F.sum("_sv") / (F.count(F.lit(1)) * F.lit(float(MEAN_SCALE)))).alias("_m")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_d", "_m"))), lambda x: x["_m"]
        ).alias("_cv")
    )


def kmeans_assign(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Fit ``iters`` Lloyd's iterations from a deterministic seed (the k
    lowest-id vectors) and return the final assignment:
    (vec_id, cluster, dist) with dist rounded to 4 decimals."""
    if k < 1 or iters < 0:
        raise ValueError("need k >= 1 and iters >= 0")
    v = vectors.select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("_v")
    )
    # Centroids live on the DRIVER between iterations (k x dim doubles —
    # the same bounded collect MLlib's KMeans does every round). Embedding
    # them as literals keeps each iteration's plan flat: a chained-DataFrame
    # formulation would re-execute every earlier round inside each later
    # one (quadratic lineage) and pay a corpus shuffle per assignment.
    cent = sorted(
        (r["vec_id"], list(r["_v"]))
        for r in v.filter(F.col("vec_id") < k).collect()
    )
    if not cent:
        raise ValueError(f"seeding needs vectors with {id_col} < k")
    for _ in range(iters):
        upd = _update(_assign(v, cent, dim), dim)
        cent = sorted((r["cid"], list(r["_cv"])) for r in upd.collect())
    final = _assign(v, cent, dim)
    return final.select(
        "vec_id", F.col("cid").alias("cluster"), F.round("dist", 4).alias("dist")
    )


def sql_kmeans_assign(k: int = 4, iters: int = 2, dim: int = EMBED_DIM) -> str:
    """DuckDB twin of ``kmeans_assign`` over the ``embeddings`` view —
    the iteration unrolled into one CTE pair per round."""
    sq = sql_sqdist("a._v", "c._cv", dim)
    assign = (
        "SELECT vec_id, _v, cid, d FROM ("
        " SELECT a.vec_id, a._v, c.cid, {sq} AS d,"
        "  row_number() OVER (PARTITION BY a.vec_id ORDER BY {sq}, c.cid)"
        "   AS rn FROM v a CROSS JOIN {cent} c) WHERE rn = 1"
    )
    update = (
        "SELECT cid, list(_m ORDER BY _d) AS _cv FROM ("
        " SELECT cid, g._d, sum(CAST(floor(_v[g._d] * {S} + 0.5) AS BIGINT))"
        "  / (count(*) * {S}.0) AS _m"
        " FROM {a} CROSS JOIN generate_series(1, {dim}) g(_d)"
        " GROUP BY cid, g._d) GROUP BY cid"
    )
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS _v FROM embeddings)",
        f"cent0 AS (SELECT vec_id AS cid, _v AS _cv FROM v WHERE vec_id < {k})",
    ]
    for i in range(iters):
        a = assign.format(sq=sq, cent=f"cent{i}")
        ctes.append(f"a{i} AS ({a})")
        u = update.format(a=f"a{i}", S=MEAN_SCALE, dim=dim)
        ctes.append(f"cent{i + 1} AS ({u})")
    final = assign.format(sq=sq, cent=f"cent{iters}")
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT vec_id, cid AS cluster, round(d, 4) AS dist FROM ({final})"
    )
