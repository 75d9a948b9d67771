"""Distributed BPE tokenizer training — merge-rule learning at corpus scale.

Byte-pair encoding training (Sennrich et al. 2016, public algorithm)
iterates: count adjacent symbol pairs, merge the most frequent pair
everywhere, repeat. The q55 pair-count query is ONE iteration's argmax
relation; this operator runs the full loop.

Scale shape: the corpus is folded to its WORD-FREQUENCY relation first
(vocabulary-sized — millions of rows at 100 TB, not trillions), and every
iteration works on that relation only:

    words(syms: array<string>, cnt: long)        persisted, re-localCheckpointed
      -> adjacent-pair explode weighted by cnt   (in-row transform)
      -> groupBy(pair) sum(cnt)                  (one small shuffle)
      -> argmax collect(1 row)                   (driver picks the merge)
      -> apply merge via in-row aggregate() fold (no shuffle)

The driver holds only the merge table (num_merges rows); per-iteration
lineage is truncated with ``localCheckpoint`` so iteration N's plan does
not replay iterations 1..N-1 (the same driver-anchoring k-means uses).
The greedy left-to-right fold reproduces reference BPE exactly:
merging (a,a) over "aaa" yields ["aa","a"].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (w, syms: array<string> of characters, cnt) word relation.

    The word identity ``w`` rides along so the post-training relation
    doubles as the word -> segmentation lookup (see ``bpe_train``'s
    ``return_segmentation``)."""
    return (
        docs.select(F.explode(TH.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w",
            F.filter(F.split(F.col("w"), ""), lambda c: c != "").alias("syms"),
            "cnt",
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    return (
        words.filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge(
    words: DataFrame,
    left: str,
    right: str,
    extra_cols: tuple[str, ...] = ("cnt",),
    fused: str | None = None,
) -> DataFrame:
    """Replace every adjacent (left, right) with the fused symbol via a
    greedy left-to-right aggregate() fold — in-row, no shuffle.

    ``fused`` defaults to ``left + right`` (BPE); WordPiece passes the
    continuation-marker-stripped fusion instead (``a`` + ``##b`` ->
    ``ab``)."""
    l, r = _sql_quote(left), _sql_quote(right)
    fs = _sql_quote(fused if fused is not None else left + right)
    fold = (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {l} AND x = {r} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({fs})) "
        "ELSE concat(acc, array(x)) END)"
    )
    return words.select(F.expr(fold).alias("syms"), *extra_cols)


# Word-frequency relations at or below this row count train on the
# driver (one collect, zero per-merge Spark jobs); larger vocabularies
# keep the distributed loop. 64k rows of short tokens is well under a
# driver-safe collect, and the two paths are pinned merge-for-merge
# identical by tests.
LOCAL_VOCAB_MAX = 65536


def _train_local(
    rows: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str, int]]:
    """Driver-side twin of the distributed loop: same pair statistic,
    same (n desc, l asc, r asc) argmax (Python str compare == Spark's
    UTF8 binary ordering — UTF-8 preserves code-point order), same
    greedy left-to-right merge fold."""
    words = [(list(syms), cnt) for syms, cnt in rows]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (l, r), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        for i, (syms, cnt) in enumerate(words):
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            words[i] = (out, cnt)
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_count: int = 2,
    return_segmentation: bool = False,
    local_threshold: int = LOCAL_VOCAB_MAX,
) -> (
    list[tuple[str, str, int]]
    | tuple[list[tuple[str, str, int]], DataFrame]
):
    """Learn up to ``num_merges`` BPE merge rules from a document corpus.

    Returns ``[(left, right, pair_count), ...]`` in merge order. Stops
    early when no pair reaches ``min_pair_count``. Ties break
    lexicographically on (left, right) so training is deterministic.

    With ``return_segmentation=True`` also returns the final
    ``(w, syms)`` word -> segmentation lookup — the training loop has
    already applied every merge to the word relation, so an encoder
    gets the segmentation table for free instead of re-scanning the
    corpus and replaying the merges (``bpe_segment``'s cost).

    Adaptive execution (the k-means pattern: distribute the data-scale
    pass, anchor the small iterative state on the driver): the corpus
    fold to word frequencies always runs distributed, then if the vocab
    relation has <= ``local_threshold`` rows the merge loop runs
    driver-side in one collect instead of 3 Spark jobs per merge; a
    larger vocabulary keeps the fully-distributed loop. Both paths are
    pinned identical by tests (``local_threshold=0`` forces the
    distributed one).
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    words = word_counts(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    if words.count() <= local_threshold:
        try:
            rows = [(list(r["syms"]), int(r["cnt"])) for r in words.collect()]
        finally:
            if not return_segmentation:
                words.unpersist()
        merges = _train_local(rows, num_merges, min_pair_count)
        if return_segmentation:
            seg = words.select("w", "syms")
            for l, r, _ in merges:
                seg = _apply_merge(seg, l, r, extra_cols=("w",))
            return merges, seg
        return merges
    try:
        for _ in range(num_merges):
            top = (
                _pair_counts(words)
                .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_pair_count:
                break
            l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
            merges.append((l, r, int(n)))
            prev = words
            words = _apply_merge(
                words, l, r, extra_cols=("w", "cnt")
            ).localCheckpoint()
            prev.unpersist()
        if return_segmentation:
            # ownership passes to the caller (checkpoint blocks released
            # with the returned DataFrame)
            return merges, words.select("w", "syms")
    finally:
        if not return_segmentation:
            words.unpersist()
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merges to a corpus: (token, syms array) per distinct
    word — the lookup table an encoder ships. Merges replay in training
    order (BPE's apply rule)."""
    out = (
        docs.select(F.explode(TH.tokens(F.col(text_col))).alias("w"))
        .distinct()
        .select(
            F.col("w"),
            F.filter(F.split(F.col("w"), ""), lambda c: c != "").alias("syms"),
        )
    )
    for l, r, _ in merges:
        out = _apply_merge(out, l, r, extra_cols=("w",))
    return out.select("w", "syms")
