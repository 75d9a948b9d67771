"""Product-quantization ANN over ``embeddings`` (array<float>) — the
compression tier below the int8 path in ``simsearch``.

Why PQ at 100 TB: scalar int8 (``simsearch.quantize``) shrinks a
64-dim float32 vector 4x; PQ with m=8 sub-codebooks of 16 centroids
stores the SAME vector in 8 nibbles (here 8 bytes of tinyint codes for
parquet friendliness) — 32x smaller than float32 — and scoring reads
only the codes plus one norm, so the candidate sweep ships ~1/30th of
the bytes the float scan would. This is the Jégou et al. 2011
("Product Quantization for Nearest Neighbor Search") design: split the
vector into m subvectors, vector-quantize each against its own small
codebook, and approximate dot products by table lookup (ADC —
asymmetric distance computation: the probe stays exact, only the
corpus side is quantized).

Spark-first shape:

- ``pq_train`` collects a DETERMINISTIC hash-ordered sample (distributed
  TakeOrdered, bounded by ``sample_cap``) and runs Lloyd's iterations in
  numpy on the driver — training on a bounded sample is the at-scale
  practice (faiss trains its quantizers on ~10^5-10^6 sampled vectors
  regardless of corpus size); the codebook itself is tiny (m*k*sub
  floats). The hash order makes the sample — and therefore the whole
  codebook — a pure function of the corpus.
- ``pq_encode`` assigns codes with one Arrow-batched ``pandas_udf``
  (argmin over k centroids per subspace is dense matrix math — numpy's
  BLAS beats 1024-term unrolled codegen expressions here; same
  sanctioned vectorized-Python tier as the sketch/codec operators).
- ``pq_search`` is where the 100 TB bytes flow, and it is PURE JVM:
  each probe precomputes its m*k lookup table ONCE (one pandas_udf over
  the probe relation, flattened to array<double>), the probe relation
  broadcasts (same plan shape as ``knn_quantized``), and the per-corpus-
  row score collapses to m ``element_at`` lookups + adds inside
  whole-stage codegen — no per-element arithmetic touches the corpus
  scan at all. Optional exact re-rank joins the float vectors back for
  the shortlist only (the production recall knob: with
  ``shortlist >= |corpus|`` the result provably equals ``knn_brute``).

Determinism: the sample is hash-ordered, numpy Lloyd's is
deterministic, argmin ties take the lowest centroid index, and empty
clusters keep their previous centroid — two trainings on the same
corpus produce bit-identical codebooks (pinned in tests/test_pq.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType
from pyspark.sql.window import Window

from ..partitioning import spread
from .simsearch import EMBED_DIM, as_double, cosine, dot_any, norm

# training-sample bound: big enough that 16-centroid sub-codebooks are
# saturated thousands of times over, small enough to collect anywhere
PQ_TRAIN_SAMPLE_CAP = 65536

# Merge fan-in bound for the exact TakeOrdered sample (r19, §2.2/§5):
# every scan partition forwards up to sample_cap candidate rows into ONE
# merge task, so a corpus-scale scan (10^5+ splits at 100 TB) funnels
# partitions x cap vector rows — terabytes — through a single fetch.
# Scans wider than this prefilter by a hash threshold first (see
# ``_prefilter_sample_scan``); the bound is partition-count-adaptive,
# not a local[32] tune (local scans stay under it and keep the
# single-pass exact path).
SAMPLE_FANIN_MAX = 64
# threshold oversampling margin: survivors ~= margin * cap under the
# uniform-hash estimate, verified exactly before use
SAMPLE_MARGIN = 4


def _norm(c, dim: int):
    """The unrolled codegen norm at the table's native width; the
    interpreted fold for any other width (eval/test geometries only —
    the unrolled kernel is the hot path)."""
    return norm(c) if dim == EMBED_DIM else F.sqrt(dot_any(c, c))


def _cosine(a, b, dim: int):
    """Dim-aware cosine: the unrolled 64-wide kernel at the native
    width, the interpreted fold otherwise — the rerank path must follow
    the codebook's dim, not assume the table default (a fixed-width
    kernel silently NULLs short vectors / truncates long ones)."""
    if dim == EMBED_DIM:
        return cosine(a, b)
    return dot_any(a, b) / (F.sqrt(dot_any(a, a)) * F.sqrt(dot_any(b, b)))


def _subspaces(x: np.ndarray, m: int) -> np.ndarray:
    """(n, dim) -> (n, m, dim//m) float64 view."""
    n, dim = x.shape
    return x.reshape(n, m, dim // m)


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 10,
    dim: int = EMBED_DIM,
    sample_cap: int = PQ_TRAIN_SAMPLE_CAP,
) -> dict:
    """Train m sub-codebooks of k centroids each; returns a plain-dict
    codebook ``{"m", "k", "dim", "sub", "centroids", "inertia"}`` where
    ``centroids[j][c]`` is the c-th centroid of subspace j and
    ``inertia`` traces the per-iteration mean squared quantization error
    (non-increasing — pinned by tests).

    The sample is the ``sample_cap`` corpus vectors with the LOWEST
    ``xxhash64(vec)`` — a distributed TakeOrdered (no full sort, no
    driver scan), reproducible across runs and cluster layouts. Zero
    vectors are excluded (they carry no direction; search excludes them
    the same way the cosine kernels do).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    x = _collect_sample(df, vec_col, dim, sample_cap)
    return _lloyd_from_sample(x, m, k, iters, dim)


def _collect_sample(
    df: DataFrame,
    vec_col: str,
    dim: int,
    sample_cap: int,
    fanin_max: int | None = None,
) -> "np.ndarray":
    """The deterministic hash-ordered training sample as one (n, dim)
    float64 array — factored out so composite trainers (the IVF-PQ
    index builds TWO codebooks) scan and collect the corpus ONCE.

    The ``localCheckpoint`` before the collect is driver protection
    (r19): collecting ``TakeOrderedAndProject`` directly takes the
    ``executeCollect`` shortcut, which merges every scan partition's
    local top-cap ON THE DRIVER — up to partitions x cap vector rows
    through one process at 100 TB scan-task counts. Materializing the
    node first runs its ``doExecute`` shape instead: per-partition
    top-cap, ONE single-partition shuffle, final top-cap in an executor
    task — the driver then fetches exactly ``cap`` rows. The sample is
    bit-identical (same multiset, same ``_h`` sort; ties only between
    identical vectors).

    Scans wider than ``fanin_max`` partitions (default
    ``SAMPLE_FANIN_MAX``) additionally prefilter by a hash threshold
    (``_prefilter_sample_scan``) so the single merge task above
    receives O(cap) rows instead of partitions x cap — the sample stays
    exactly the global top-cap either way (the prefilter is verified
    before use and falls back to the unfiltered scan)."""
    v = as_double(vec_col)
    base = (
        df.select(v.alias("_v"))
        .filter(F.size("_v") == dim)
        .filter(_norm(F.col("_v"), dim) > 0)
        # hash the array value directly — stringifying 64 doubles per
        # row just to hash it would dominate the sampling scan at scale
        .withColumn("_h", F.xxhash64(F.col("_v")))
    )
    cap = int(sample_cap)
    limit = SAMPLE_FANIN_MAX if fanin_max is None else fanin_max
    if base.rdd.getNumPartitions() > limit:  # metadata-only check
        base = _prefilter_sample_scan(base, cap)
    rows = (
        base.orderBy("_h")
        .limit(cap)
        .select("_v")
        .localCheckpoint(eager=True)
        .collect()
    )
    return np.asarray([r["_v"] for r in rows], dtype=np.float64)


def _prefilter_sample_scan(base: DataFrame, cap: int) -> DataFrame:
    """Bound the TakeOrdered merge fan-in on wide scans (§2.2, §5):
    drop rows that provably cannot reach the top-cap BEFORE the
    per-partition top-cap runs, so the single merge task receives
    ~``SAMPLE_MARGIN * cap`` rows instead of partitions x cap.

    ``xxhash64`` is uniform over int64, so the rank-(margin*cap) hash
    sits near ``int64_min + 2^64 * margin*cap/n``. The threshold only
    PREFILTERS: the exact TakeOrdered in the caller still picks the
    true top-cap from the survivors, so an estimation miss (e.g. hash
    mass concentrated by duplicate vectors) can only trigger the
    fallback below, never change the sample. Costs one extra
    column-pruned count pass over the scan — at corpus scale a fully
    parallel scan trades against a partitions x cap single-task fetch.
    """
    n = base.count()
    if n <= cap * SAMPLE_MARGIN:
        # whole relation is merge-sized (covers n < cap, where a
        # prefilter could drop rows the sample must keep)
        return base
    thr = min(
        -(1 << 63) + ((1 << 64) * SAMPLE_MARGIN * cap) // n,
        (1 << 63) - 1,
    )
    survivors = base.filter(F.col("_h") <= F.lit(thr)).localCheckpoint(
        eager=True
    )
    if survivors.count() >= cap:
        # >= cap rows hash at or below thr, so the global top-cap all
        # survive: exact-equivalence holds
        return survivors
    # duplicates skewed the hash mass past the margin: exact fallback
    return base


def _lloyd_from_sample(
    x: "np.ndarray", m: int, k: int, iters: int, dim: int
) -> dict:
    """Deterministic numpy Lloyd's over a collected sample (the second
    half of ``pq_train``; see its docstring for the contract)."""
    if len(x) < k:
        raise ValueError(f"need at least k={k} sample vectors, got {len(x)}")
    xs = _subspaces(x, m)  # (n, m, sub)
    # init: first k sample subvectors per subspace, in hash order
    cent = np.array([xs[:k, j, :] for j in range(m)])  # (m, k, sub)
    inertia: list[float] = []
    for _ in range(iters):
        # dists (n, m, k): |x|^2 - 2 x.c + |c|^2 per subspace
        d2 = (
            (xs**2).sum(-1, keepdims=True)
            - 2.0 * np.einsum("nms,mks->nmk", xs, cent)
            + (cent**2).sum(-1)[None, :, :]
        )
        code = d2.argmin(-1)  # (n, m); ties -> lowest index
        inertia.append(float(np.take_along_axis(d2, code[..., None], -1).mean()))
        for j in range(m):
            for c in range(k):
                mask = code[:, j] == c
                if mask.any():  # empty cluster keeps its centroid
                    cent[j, c] = xs[mask, j, :].mean(0)
    return {
        "m": m,
        "k": k,
        "dim": dim,
        "sub": dim // m,
        "centroids": cent.tolist(),
        "inertia": inertia,
    }


def assign_udf(codebook: dict):
    """Arrow-batched nearest-centroid assigner for ``codebook`` — the
    shared encode kernel (``pq_encode`` wraps it; ``ann_index`` composes
    two of them in ONE projection so corpus encoding never joins two
    derivations of the same scan)."""
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(codebook["centroids"], dtype=np.float64)  # (m,k,sub)
    m = int(codebook["m"])
    c_sq = (cent**2).sum(-1)  # (m, k)

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(e, dtype=np.float64) for e in vecs])
        if x.size == 0:
            return pd.Series([], dtype=object)
        xs = _subspaces(x, m)
        d2 = -2.0 * np.einsum("nms,mks->nmk", xs, cent) + c_sq[None, :, :]
        code = d2.argmin(-1).astype(np.int32)
        return pd.Series(list(code))

    return assign


def pq_encode(
    df: DataFrame,
    codebook: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, code array<int> length m, vnorm double): nearest-centroid
    code per subspace plus the float vector's L2 norm (carried so the
    ADC score can be normalized into an approximate cosine without
    touching the floats again). Zero-norm vectors are excluded, like
    every cosine kernel in ``simsearch``.

    One Arrow-batched pandas_udf; the codebook rides the closure (tiny:
    m*k*sub doubles). Encoding is a pure function of (vector, codebook)
    — bit-stable across runs and partitionings (pinned by tests).
    """
    assign = assign_udf(codebook)
    dim = int(codebook["dim"])
    v = as_double(vec_col)
    return (
        spread(df)
        .select(F.col(id_col).alias("vec_id"), v.alias("_v"))
        .filter(F.size("_v") == dim)
        .withColumn("vnorm", _norm(F.col("_v"), dim))
        .filter(F.col("vnorm") > 0)
        .select("vec_id", assign(F.col("_v")).alias("code"), "vnorm")
    )


def _lut_udf(codebook: dict):
    """Arrow-batched ADC lookup-table builder: per vector, the
    flattened m*k table lut[j*k + c] = dot(vec_sub_j, centroid[j][c])
    so the scoring expression is plain ``element_at``."""
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(codebook["centroids"], dtype=np.float64)
    m, k = int(codebook["m"]), int(codebook["k"])

    @pandas_udf(ArrayType(DoubleType()))
    def lut(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(e, dtype=np.float64) for e in vecs])
        if x.size == 0:
            return pd.Series([], dtype=object)
        xs = _subspaces(x, m)
        t = np.einsum("nms,mks->nmk", xs, cent)  # (n, m, k)
        return pd.Series(list(t.reshape(len(x), m * k)))

    return lut


def _probe_luts(
    probes: DataFrame,
    codebook: dict,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(probe_id, lut array<double> length m*k, pnorm): per-probe ADC
    lookup table relation (see ``_lut_udf``)."""
    lut = _lut_udf(codebook)
    dim = int(codebook["dim"])
    v = as_double(vec_col)
    return (
        probes.select(F.col(id_col).alias("probe_id"), v.alias("_v"))
        .filter(F.size("_v") == dim)
        .withColumn("pnorm", _norm(F.col("_v"), dim))
        .filter(F.col("pnorm") > 0)
        .select("probe_id", lut(F.col("_v")).alias("lut"), "pnorm")
    )


def adc_score(codebook: dict):
    """Builtin-expression ADC kernel: approximate cosine =
    sum_j lut[j*k + code[j]] / (vnorm * pnorm). m element_at lookups +
    left-associated adds — whole-stage codegen over the corpus scan;
    the association order is fixed so scores are reproducible."""
    m, k = int(codebook["m"]), int(codebook["k"])
    acc = None
    for j in range(m):
        term = F.element_at(
            F.col("lut"),
            (F.lit(j * k + 1) + F.element_at(F.col("code"), j + 1)).cast("int"),
        )
        acc = term if acc is None else acc + term
    return acc / (F.col("vnorm") * F.col("pnorm"))


def pq_search(
    corpus_codes: DataFrame,
    probes: DataFrame,
    codebook: dict,
    k: int = 5,
    shortlist: int | None = None,
    rerank_with: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k ANN by ADC over PQ codes; same output contract as
    ``knn_brute``/``knn_quantized``: (probe_id, vec_id, score, rank).

    ``corpus_codes`` is ``pq_encode``'s output (the only relation that
    scales; codes + one norm per vector). Probes broadcast with their
    precomputed LUTs. With ``rerank_with`` (the float-vector relation),
    the ADC pass only SHORTLISTS ``shortlist`` candidates per probe
    (default 4k) and the final top-k is exact cosine on the shortlist —
    the recall/byte knob: shortlist >= |corpus| reproduces ``knn_brute``
    exactly (pinned by tests).
    """
    luts = _probe_luts(probes, codebook, vec_col, id_col)
    scored = (
        corpus_codes.crossJoin(F.broadcast(luts))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            adc_score(codebook).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    if rerank_with is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score", "rank")
        )
    n_short = shortlist if shortlist is not None else 4 * k
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_short)
        .select("probe_id", "vec_id")
    )
    dim = int(codebook["dim"])
    v = as_double(vec_col)
    vecs = rerank_with.select(
        F.col(id_col).alias("_rid"), v.alias("_rv")
    ).filter(_norm(F.col("_rv"), dim) > 0)
    pv = vecs.select(
        F.col("_rid").alias("probe_id"), F.col("_rv").alias("_pv")
    )
    cv = vecs.select(F.col("_rid").alias("vec_id"), F.col("_rv").alias("_cv"))
    exact = (
        cand.join(cv, "vec_id")
        .join(F.broadcast(pv), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            _cosine(F.col("_cv"), F.col("_pv"), dim).alias("score"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "score", "rank")
    )
