"""Embedding similarity search over ``embeddings`` (array<float>, 64-dim).

Three k-NN strategies with one shared scoring kernel:

- brute-force: probes broadcast against the corpus, exact cosine, window
  top-k. The *baseline and oracle*: exact, but scores |corpus| x |probes|
  rows — at 100 TB you only run it for evaluation slices.
- LSH-pruned: 8 fixed random hyperplanes -> 256 sign-buckets; probes only
  score vectors in their own bucket (candidate set ~ corpus/256). The
  hyperplanes are deterministic integer literals, so the bucket function is
  reproducible in the DuckDB oracle.
- IVF-pruned: the corpus's coarse cluster id (``label``) is the inverted
  index; probes score only their own cluster. In a real pipeline the label
  comes from a k-means fit; here it ships with the table.

Scale notes: cosine is unrolled builtin arithmetic inside whole-stage
codegen (cast to double once — no UDF, no Python, no interpreted lambda).
The pruned variants turn the crossJoin into an equi-join on (bucket) /
(label), which Catalyst shuffles or broadcasts like any other join key;
the window top-k then runs on the pruned candidate set only. Norms are
precomputed once per side. The summation association order is fixed and
mirrored by the SQL generator, so DuckDB reproduces scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.texthash import _lcg
from ..partitioning import spread

N_PLANES = 8
PLANE_DIM = 64
# deterministic hyperplane components in [-1000, 1000] (integer -> exact)
HYPERPLANES = [
    [v - 1000 for v in _lcg(1000 + p, PLANE_DIM, 0, 2001)] for p in range(N_PLANES)
]


EMBED_DIM = 64  # the embeddings table's vector width
DOT_CHUNK = 8


def dot(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Unrolled fixed-dimension dot product in double.

    Chunked left-associated sums: ((a1b1+a2b2)+...)+... per 8-wide chunk,
    then chunks combined left-to-right. Fully builtin arithmetic -> runs in
    whole-stage codegen (an interpreted zip_with/aggregate fold benchmarked
    ~10x slower), and the DuckDB oracle generator emits the IDENTICAL
    association order, so scores stay bit-for-bit reproducible.

    Pass MATERIALIZED array columns (attribute refs), not inline
    expressions — each element access references the argument again.
    """
    chunks = []
    for c0 in range(0, dim, DOT_CHUNK):
        acc = None
        for i in range(c0 + 1, min(c0 + DOT_CHUNK, dim) + 1):
            term = F.element_at(a, i) * F.element_at(b, i)
            acc = term if acc is None else acc + term
        chunks.append(acc)
    out = chunks[0]
    for ch in chunks[1:]:
        out = out + ch
    return out


def dot_any(a: Column, b: Column) -> Column:
    """Generic-dimension fold fallback (interpreted; eval/debug only)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sql_dot(a: str, b: str, dim: int = EMBED_DIM) -> str:
    """DuckDB twin of ``dot`` — identical association order."""
    chunks = []
    for c0 in range(0, dim, DOT_CHUNK):
        terms = [
            f"{a}[{i}] * {b}[{i}]"
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


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lsh_bucket(vec: Column) -> Column:
    """Sign-bucket id in [0, 2^N_PLANES) from fixed integer hyperplanes."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(float(v)) for v in HYPERPLANES[p]])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return bucket


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prune_on: list[str] | None = None,
) -> DataFrame:
    """Top-k neighbours per probe: (probe_id, vec_id, score, rank).

    prune_on: optional equi-join columns (e.g. ["bucket"] or ["label"])
    that must exist on both sides — this is what turns the crossJoin into
    a pruned candidate join for the LSH/IVF variants. Self-matches
    (probe_id == vec_id) are excluded. Scores stay UNROUNDED: both engines
    fold the dot product sequentially in double, so the scores — and the
    (score desc, vec_id asc) order — are bit-identical; rounding would
    actually break parity at half-boundaries where round() implementations
    disagree.
    """
    keep = prune_on or []
    # scoring cost is |corpus| x |probes| dot products — spread the corpus
    # so a narrow scan doesn't serialize it on one core
    c = spread(corpus).select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"), *keep
    ).withColumn("v_norm", norm(F.col("v")))
    p = probes.select(
        F.col(id_col).alias("probe_id"), as_double(vec_col).alias("q"), *keep
    ).withColumn("q_norm", norm(F.col("q")))
    # Broadcast the probes ONLY on the brute-force path, where the contract
    # is an eval-sized probe slice. The pruned (LSH/IVF) paths are plain
    # equi-joins: at corpus-vs-corpus retrieval scale the probe side is as
    # big as the corpus, so a forced broadcast would OOM — let AQE pick
    # broadcast when the probe side really is small.
    joined = c.join(p, on=keep) if keep else c.crossJoin(F.broadcast(p))
    scored = joined.filter(F.col("vec_id") != F.col("probe_id")).select(
        "probe_id",
        "vec_id",
        (
            dot(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm"))
        ).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "score", "rank")
    )


def knn_brute(
    corpus: DataFrame, probes: DataFrame, k: int = 5, **kw
) -> DataFrame:
    """Exact brute-force k-NN (baseline / evaluation path)."""
    return cosine_topk(corpus, probes, k, **kw)


def knn_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate k-NN: candidates share the sign-bucket."""

    def with_bucket(df: DataFrame) -> DataFrame:
        # materialize the double vector before the 8x64-term bucket
        # expression references it, then drop the scratch column;
        # spread BEFORE the bucket projection so it computes on all cores
        return (
            spread(df).withColumn("_v", as_double(vec_col))
            .withColumn("bucket", lsh_bucket(F.col("_v")))
            .drop("_v")
        )

    return cosine_topk(
        with_bucket(corpus), with_bucket(probes), k, id_col, vec_col,
        prune_on=["bucket"],
    )


def knn_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF-style k-NN: probe scores only its coarse cluster's vectors."""
    return cosine_topk(corpus, probes, k, id_col, vec_col, prune_on=[cluster_col])


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, score) near-duplicate pairs by cosine, LSH-blocked.

    Pairs are generated only within a sign-bucket (the scale guard), then
    verified exactly — same structure as the MinHash dedup pipeline.
    """
    b = spread(df).select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"))).withColumn(
        "n", norm(F.col("v"))
    )
    a_side = b.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("n").alias("na"), "bucket",
    )
    b_side = b.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), "bucket",
    )
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "score"
            ),
        )
        .filter(F.col("score") >= threshold)
    )


# --- int8 scalar quantization (the 4x memory/bandwidth lever for ANN) -------

QUANT_LEVELS = 127  # symmetric int8 range


def quantize(vec: Column, dim: int = EMBED_DIM) -> Column:
    """(q array<int>, scale double): symmetric per-vector int8 scalar
    quantization — q[i] = round(v[i] * 127 / max|v|). At corpus scale the
    int8 codes are what the scoring pass reads (4x less than float32,
    8x less than double); the float vector is only touched for optional
    exact re-ranking of the top candidates.

    round() here is Spark's HALF_UP on an exact double product, mirrored
    by the SQL twin, so codes are engine-exact; all-zero vectors get
    scale 0 and all-zero codes.
    """
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = F.when(mx > 0, mx / F.lit(float(QUANT_LEVELS))).otherwise(F.lit(0.0))
    q = F.when(
        mx > 0,
        F.transform(vec, lambda x: F.round(x * F.lit(float(QUANT_LEVELS)) / mx)
                    .cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    return F.struct(q.alias("q"), scale.alias("scale"))


def dot_int(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Unrolled integer dot product over int8 codes (exact int64 sums —
    no association-order caveat at all, unlike the float kernel)."""
    chunks = []
    for c0 in range(0, dim, DOT_CHUNK):
        acc = None
        for i in range(c0 + 1, min(c0 + DOT_CHUNK, dim) + 1):
            term = F.element_at(a, i).cast("long") * F.element_at(b, i).cast("long")
            acc = term if acc is None else acc + term
        chunks.append(acc)
    out = chunks[0]
    for ch in chunks[1:]:
        out = out + ch
    return out


def sql_quantize_cte(src: str, vec: str = "v") -> str:
    """DuckDB CTE body computing (q, scale) from relation ``src`` —
    bit-identical to ``quantize``."""
    mx = f"list_max(list_transform({vec}, x -> abs(x)))"
    return (
        f"SELECT *, CASE WHEN {mx} > 0 THEN {mx} / {QUANT_LEVELS}.0 ELSE 0.0 END"
        f" AS scale,"
        f" CASE WHEN {mx} > 0 THEN list_transform({vec},"
        f" x -> CAST(round(x * {QUANT_LEVELS}.0 / {mx}) AS INTEGER))"
        f" ELSE list_transform({vec}, x -> 0) END AS q"
        f" FROM {src}"
    )


def sql_dot_int(a: str, b: str, dim: int = EMBED_DIM) -> str:
    """DuckDB twin of ``dot_int``."""
    chunks = []
    for c0 in range(0, dim, DOT_CHUNK):
        terms = [
            f"CAST({a}[{i}] AS BIGINT) * CAST({b}[{i}] AS BIGINT)"
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


def knn_quantized(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute k-NN over int8 codes: approximate cosine =
    (q_a . q_b) * scale_a * scale_b / (|v_a| |v_b|), with norms carried
    from quantization time. Same plan shape as the exact brute path
    (probes broadcast, one window shuffle), but the scored relation is
    int8 codes + two doubles per vector — the memory/bandwidth profile a
    100 TB ANN sweep actually ships. Integer products make the scores
    themselves reproducible to the last bit with zero float-order caveats.
    """
    def prep(df: DataFrame, idn: str, qn: str, sn: str, nn: str) -> DataFrame:
        v = as_double(vec_col)
        return spread(df).select(
            F.col(id_col).alias(idn), v.alias("_v")
        ).select(
            idn,
            quantize(F.col("_v")).alias("_qs"),
            norm(F.col("_v")).alias(nn),
        ).filter(
            # cosine is undefined for the zero vector: exclude rather
            # than divide by zero (ANSI mode raises)
            F.col(nn) > 0
        ).select(
            idn, F.col("_qs.q").alias(qn), F.col("_qs.scale").alias(sn), nn
        )

    c = prep(corpus, "vec_id", "cq", "cs", "cn")
    p = prep(probes, "probe_id", "pq", "ps", "pn")
    scored = c.crossJoin(F.broadcast(p)).filter(
        F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "vec_id",
        (
            dot_int(F.col("cq"), F.col("pq")).cast("double")
            * F.col("cs") * F.col("ps") / (F.col("cn") * F.col("pn"))
        ).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "score", "rank")
    )


# --- binary (1-bit) signatures ----------------------------------------------


def dim_means(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension corpus means (one 1-row aggregate) — the centering
    vector that makes sign bits informative: raw sign bits of a
    non-centered dimension are constant and carry zero ranking signal."""
    v = as_double(vec_col)
    row = df.select(v.alias("_v")).filter(
        F.size("_v") == EMBED_DIM
    ).agg(
        *[
            F.avg(F.element_at("_v", i + 1)).alias(f"m{i}")
            for i in range(EMBED_DIM)
        ]
    ).first()
    return [float(row[f"m{i}"]) for i in range(EMBED_DIM)]


def binary_signature(
    vec: Column, means: list[float] | None = None, dim: int = EMBED_DIM
) -> Column:
    """Pack the vector's centered sign bits into ONE BIGINT — the
    extreme end of the compression ladder (float64 2,048 bits -> int8
    512 -> PQ ~64 -> THIS, 64 bits/vector): bit i set iff
    ``v[i] > means[i]``. Unrolled bitwise-OR of 64 conditional
    shiftlefts — whole-stage codegen, no udf; bit 63 wraps to the long
    sign bit, which is fine (signatures are bit patterns, compared only
    by XOR/popcount)."""
    if means is None:
        means = [0.0] * dim
    acc = F.lit(0).cast("long")
    for i in range(dim):
        acc = acc.bitwiseOR(
            F.when(
                F.element_at(vec, i + 1) > F.lit(float(means[i])),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return acc


def binary_signatures(
    df: DataFrame,
    means: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig bigint): the 64-bit signature relation — 8 bytes per
    vector is what a 100 TB pre-ranking sweep actually scans."""
    v = as_double(vec_col)
    return df.select(
        F.col(id_col).alias("vec_id"), v.alias("_v")
    ).filter(
        # same admission rule as the other similarity tiers (pq_encode,
        # knn_quantized, the cosine kernels): a zero-norm vector has no
        # direction, so its centering-means-only signature would rank
        # in Hamming shortlists that exact-cosine rerank then NULLs out
        (F.size("_v") == EMBED_DIM) & (norm(F.col("_v")) > 0)
    ).select(
        "vec_id", binary_signature(F.col("_v"), means).alias("sig")
    )


def knn_hamming(
    corpus_sigs: DataFrame,
    probe_sigs: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k by Hamming distance over 64-bit signatures: one
    ``bit_count(XOR)`` per candidate — the cheapest possible scoring
    kernel (two long ops inside codegen), the same broadcast-probes +
    window-top-k plan shape as every knn_* here. Output
    (probe_id, vec_id, hamming, rank); ties break on vec_id so ranking
    is total. The standard use is PRE-RANKING: shortlist by Hamming,
    exact-rerank the shortlist (compose with pq_search's rerank or
    cosine_topk)."""
    p = probe_sigs.select(
        F.col("vec_id").alias("probe_id"), F.col("sig").alias("psig")
    )
    scored = corpus_sigs.crossJoin(F.broadcast(p)).filter(
        F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "vec_id",
        F.bit_count(F.col("sig").bitwiseXOR(F.col("psig"))).alias("hamming"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.asc("hamming"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "hamming", "rank")
    )
