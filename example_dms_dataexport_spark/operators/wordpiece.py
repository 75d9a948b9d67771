"""Distributed WordPiece tokenizer training — the BERT-family member of
the engine's tokenizer trio (BPE in ``operators/bpe``, unigram-LM in
``operators/unigram``).

WordPiece (Schuster & Nakajima 2012; the BERT variant, Wu et al. 2016)
is BPE with a different pair-selection statistic: instead of the most
FREQUENT adjacent pair it merges the pair maximizing the likelihood
gain ``count(ab) / (count(a) * count(b))`` — rare symbols that almost
always co-occur fuse before frequent-but-independent ones. Symbols
carry the ``##`` continuation convention: a word's first character is
bare, every later one is ``##``-prefixed, and fusing strips the right
side's marker (``a`` + ``##b`` -> ``ab``, ``##a`` + ``##b`` ->
``##ab``), so a learned piece is usable exactly where it was learned.

Scale shape: identical to BPE's — the corpus folds once to its
word-frequency relation, and each merge iteration is two small
vocabulary-sized aggregations (pair counts + symbol counts), one
argmax collect, and an in-row fold; nothing per-iteration touches the
corpus again. The same adaptive execution applies: vocabularies at or
below ``LOCAL_VOCAB_MAX`` train driver-side in one collect, and the
two paths are pinned merge-for-merge identical.

Encoding is NOT merge replay (BPE's rule) but greedy longest-match-
first against the final vocabulary — the canonical WordPiece matcher —
run as one Arrow batch over the DISTINCT-WORD relation (vocabulary-
sized, never the corpus) with the vocab set riding the closure.

Determinism: the ranking statistic is compared as
(score double, pair count desc, left asc, right asc); the driver twin
computes the double with the same operation order
(``n / (float(nl) * float(nr))``) so both paths rank identically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions import texthash as TH
from .bpe import LOCAL_VOCAB_MAX, _apply_merge, _pair_counts


def _wp_fuse(left: str, right: str) -> str:
    return left + (right[2:] if right.startswith("##") else right)


def wp_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (w, syms, cnt) with the ## continuation convention:
    "word" -> ["w", "##o", "##r", "##d"]."""
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != "")
    syms = F.expr(
        "transform(filter(split(w, ''), c -> c != ''),"
        " (c, i) -> CASE WHEN i = 0 THEN c ELSE '##' || c END)"
    )
    return (
        docs.select(F.explode(TH.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w", syms.alias("syms"), "cnt")
        .filter(F.size(chars) >= 1)
    )


def _train_local_wp(
    rows: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str, float, int]]:
    """Driver twin of the distributed loop: same statistic, identical
    float evaluation order, same tie-break."""
    words = [(list(syms), cnt) for syms, cnt in rows]
    merges: list[tuple[str, str, float, int]] = []
    for _ in range(num_merges):
        pair_n: dict[tuple[str, str], int] = {}
        sym_n: dict[str, int] = {}
        for syms, cnt in words:
            for s in syms:
                sym_n[s] = sym_n.get(s, 0) + cnt
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + cnt
        if not pair_n:
            break
        (l, r), n = min(
            pair_n.items(),
            key=lambda kv: (
                -(kv[1] / (float(sym_n[kv[0][0]]) * float(sym_n[kv[0][1]]))),
                -kv[1],
                kv[0][0],
                kv[0][1],
            ),
        )
        if n < min_pair_count:
            break
        score = n / (float(sym_n[l]) * float(sym_n[r]))
        merges.append((l, r, score, n))
        fused = _wp_fuse(l, r)
        for i, (syms, cnt) in enumerate(words):
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = fused
                else:
                    out.append(s)
            words[i] = (out, cnt)
    return merges


def _sym_counts(words: DataFrame) -> DataFrame:
    return (
        words.select(F.explode("syms").alias("s"), "cnt")
        .groupBy("s")
        .agg(F.sum("cnt").alias("sn"))
    )


def wordpiece_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_count: int = 2,
    local_threshold: int = LOCAL_VOCAB_MAX,
) -> dict:
    """Learn up to ``num_merges`` WordPiece merges; returns
    ``{"merges": [(left, right, score, pair_count), ...],
    "vocab": [piece, ...]}`` — vocab is every initial symbol plus each
    merge's fused piece, sorted (the greedy encoder's match set).

    Stops early when no pair reaches ``min_pair_count``. The likelihood
    ratio prefers pairs that predict each other over pairs that are
    merely common — the BERT-family inductive bias.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    words = wp_word_counts(docs, text_col).localCheckpoint()
    initial = [
        r["s"] for r in _sym_counts(words).select("s").distinct().collect()
    ]
    merges: list[tuple[str, str, float, int]] = []
    try:
        if words.count() <= local_threshold:
            rows = [(list(r["syms"]), int(r["cnt"])) for r in words.collect()]
            merges = _train_local_wp(rows, num_merges, min_pair_count)
        else:
            for _ in range(num_merges):
                syms = _sym_counts(words)
                ln = syms.select(
                    F.col("s").alias("l"), F.col("sn").alias("_ln")
                )
                rn = syms.select(
                    F.col("s").alias("r"), F.col("sn").alias("_rn")
                )
                top = (
                    _pair_counts(words)
                    .join(ln, "l")
                    .join(rn, "r")
                    .select(
                        "l",
                        "r",
                        "n",
                        (
                            F.col("n")
                            / (
                                F.col("_ln").cast("double")
                                * F.col("_rn").cast("double")
                            )
                        ).alias("score"),
                    )
                    .orderBy(
                        F.desc("score"), F.desc("n"), F.asc("l"), F.asc("r")
                    )
                    .limit(1)
                    .collect()
                )
                if not top or top[0]["n"] < min_pair_count:
                    break
                l, r = top[0]["l"], top[0]["r"]
                merges.append((l, r, float(top[0]["score"]), int(top[0]["n"])))
                prev = words
                words = _apply_merge(
                    words, l, r, extra_cols=("w", "cnt"), fused=_wp_fuse(l, r)
                ).localCheckpoint()
                prev.unpersist()
    finally:
        words.unpersist()
    vocab = sorted(set(initial) | {_wp_fuse(l, r) for l, r, _, _ in merges})
    return {"merges": merges, "vocab": vocab}


def wordpiece_oracle_sql(
    num_merges: int, min_pair_count: int = 2, table: str = "documents"
) -> str:
    """DuckDB restatement of ``wordpiece_train`` over the ``documents``
    view — the q81-BPE sentinel-replace pattern with WordPiece's two
    deltas: symbol counts join the pair relation so the argmax ranks by
    ``n / (ln * rn)`` (double division in the same operation order as
    both engine paths), and the rewrite's replacement strips the right
    side's ``##`` marker. Emits (merge_rank, left, right, score,
    pair_count) in merge order. Register-ready as a driver face once a
    window slot opens (r18 — the r16/r17 windows are forced); until
    then tests/test_wordpiece.py runs the parity check in pytest."""
    from ..functions import texthash as TH

    stages = [
        f"""
    w0 AS MATERIALIZED (
        SELECT w,
               chr(1) || substr(w, 1, 1) || chr(1) ||
               CASE WHEN len(w) > 1
                    THEN regexp_replace(substr(w, 2), '(.)',
                         chr(1) || '##\\1' || chr(1), 'g')
                    ELSE '' END AS s,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({TH.sql_tokens('text')}) AS w FROM {table})
        WHERE len(w) >= 1
        GROUP BY w
    )"""
    ]
    prev = "w0"
    for k in range(1, num_merges + 1):
        p, sc, m, w = f"p{k}", f"s{k}", f"m{k}", f"w{k}"
        stages.append(
            f"""
    {p} AS MATERIALIZED (
        SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS n
        FROM (
            SELECT unnest(list_transform(
                       generate_series(1, len(syms) - 1),
                       i -> {{'l': trim(syms[i], chr(1)),
                             'r': trim(syms[i + 1], chr(1))}})) AS p,
                   cnt
            FROM (SELECT string_split(s, chr(1) || chr(1)) AS syms, cnt
                  FROM {prev})
            WHERE len(syms) >= 2
        )
        GROUP BY p.l, p.r
    ),
    {sc} AS MATERIALIZED (
        SELECT sym, CAST(sum(cnt) AS BIGINT) AS sn
        FROM (
            SELECT unnest(list_transform(
                       string_split(s, chr(1) || chr(1)),
                       x -> trim(x, chr(1)))) AS sym, cnt
            FROM {prev}
        )
        GROUP BY sym
    ),
    {m} AS MATERIALIZED (
        SELECT l, r, n,
               CAST(n AS DOUBLE) /
                   (CAST(ln.sn AS DOUBLE) * CAST(rn.sn AS DOUBLE)) AS score,
               chr(1) || l || chr(1) || chr(1) || r || chr(1) AS pat,
               chr(1) || l ||
                   CASE WHEN starts_with(r, '##') THEN substr(r, 3)
                        ELSE r END || chr(1) AS rep
        FROM {p}
        JOIN {sc} ln ON ln.sym = l
        JOIN {sc} rn ON rn.sym = r
        WHERE n >= {min_pair_count}
        ORDER BY score DESC, n DESC, l ASC, r ASC LIMIT 1
    ),
    {w} AS MATERIALIZED (
        SELECT w,
               CASE WHEN (SELECT pat FROM {m}) IS NULL THEN s
                    ELSE replace(s, (SELECT pat FROM {m}),
                                 (SELECT rep FROM {m}))
               END AS s, cnt
        FROM {prev}
    )"""
        )
        prev = w
    union = "\n        UNION ALL ".join(
        f'SELECT {k} AS merge_rank, l AS "left", r AS "right",'
        f" score, n AS pair_count FROM m{k}"
        for k in range(1, num_merges + 1)
    )
    return (
        "WITH "
        + ",".join(stages)
        + f"\n    SELECT * FROM ({union}) ORDER BY merge_rank"
    )


def greedy_encode(
    w: str, vset: frozenset, max_len: int, unk: str = "[UNK]"
) -> list[str]:
    """Pure greedy longest-match-first WordPiece matcher (the udf's
    kernel, module-level so the property suite can hammer it without a
    session): position 0 matches bare pieces, later positions match
    ##-prefixed ones; any unmatchable remainder yields whole-word
    ``unk`` (BERT's rule)."""
    pieces: list[str] = []
    i, n = 0, len(w)
    if n == 0:
        return [unk]
    while i < n:
        j = min(n, i + max_len)
        while j > i:
            cand = w[i:j] if i == 0 else "##" + w[i:j]
            if cand in vset:
                pieces.append(cand)
                break
            j -= 1
        if j == i:
            return [unk]
        i = j
    return pieces


def wordpiece_segment(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    unk: str = "[UNK]",
) -> DataFrame:
    """(w, pieces array<string>): canonical greedy longest-match-first
    WordPiece encoding of every DISTINCT corpus word against ``vocab``
    (a word with any unmatchable remainder encodes as ``[unk]`` whole,
    per BERT). One Arrow batch over the vocabulary-sized distinct-word
    relation; the vocab set rides the closure."""
    from pyspark.sql.functions import pandas_udf

    vset = frozenset(vocab)
    max_len = max((len(v) for v in vset), default=1)

    @pandas_udf(ArrayType(StringType()))
    def encode(wordser: pd.Series) -> pd.Series:
        return pd.Series(
            [greedy_encode(w, vset, max_len, unk) for w in wordser]
        )

    return (
        docs.select(F.explode(TH.tokens(F.col(text_col))).alias("w"))
        .distinct()
        .select("w", encode(F.col("w")).alias("pieces"))
    )
