"""Distributed unigram-LM tokenizer training (SentencePiece-style EM).

The unigram language-model tokenizer (Kudo 2018, "Subword
Regularization", public algorithm) models a word as a sequence of
independent pieces and trains by EM: seed a large candidate-piece
vocabulary, alternate (E) segment every word under the current piece
log-probs and (M) re-estimate the probs from the piece counts, pruning
low-utility pieces between rounds until the target vocabulary size.
This is the trainer the mT5-style mixture story (q149) presumes;
``operators/bpe.py`` holds the BPE counterpart.

Scale shape — same discipline as BPE (``bpe.py``): the corpus folds to
its WORD-FREQUENCY relation first (vocabulary-sized — millions of rows
at 100 TB, not trillions), and every EM iteration works on that
relation only:

    words(w, cnt)                       persisted once
      -> seed: substring explode        (one shuffle, top-k by freq)
      -> E-step: per-word Viterbi DP    (mapInPandas, map-side combined)
      -> groupBy(piece) sum             (one vocabulary-sized shuffle)
      -> M-step + prune                 (driver: vocab is bounded)

The Viterbi DP (variable-length segmentation with a hash-table piece
lookup) is genuinely inexpressible with built-in columnar functions, so
the E-step is the sanctioned Pandas-UDF case: Arrow-batched
``mapInPandas`` with the (driver-bounded) piece table in the closure and
per-task partial counts, so the shuffle carries at most |vocab| rows per
task, never a row per word. Hard (Viterbi) EM rather than full
forward-backward keeps every count an integer — which makes the
distributed loop and the driver-side twin (``_train_local_unigram``)
bit-identical, pinned by tests. Pruning is the count-based
simplification of SentencePiece's loss-ranked shrink: keep all single
characters (coverage invariant: every word stays segmentable), drop the
lowest-count pieces by ``prune_frac`` per round until ``vocab_size``
remains — deterministic under the (count desc, piece asc) order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import LOCAL_VOCAB_MAX


def _viterbi_pieces(
    w: str, logp: dict[str, float], max_len: int
) -> list[str] | None:
    """Best segmentation of ``w`` under piece log-probs ``logp``
    (max-sum DP). Ties prefer the LONGER last piece — a deterministic
    rule both execution paths share. None when some character of ``w``
    has no piece (cannot happen after seeding, which always keeps
    single characters)."""
    n = len(w)
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[int] = [0] * (n + 1)
    for j in range(1, n + 1):
        for ln in range(1, min(max_len, j) + 1):
            lp = logp.get(w[j - ln : j])
            if lp is None:
                continue
            cand = best[j - ln] + lp
            # strict > plus the descending-length visit order would
            # prefer SHORT pieces; >= with ascending ln prefers the
            # longest piece among equals
            if cand >= best[j]:
                best[j] = cand
                back[j] = ln
    if best[n] == -math.inf:
        return None
    out: list[str] = []
    j = n
    while j > 0:
        out.append(w[j - back[j] : j])
        j -= back[j]
    out.reverse()
    return out


def _seed_vocab(words: DataFrame, max_piece_len: int, seed_size: int) -> DataFrame:
    """Candidate pieces: every substring of every word up to
    ``max_piece_len`` characters, frequency-weighted by the word count —
    one in-row double explode plus one vocabulary-keyed shuffle. The
    top ``seed_size`` by (freq desc, piece asc) survive; single
    characters are ALWAYS kept regardless of rank (the coverage
    invariant every later prune also preserves)."""
    subs = (
        words.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)), i -> "
                    f"transform(sequence(1, least({int(max_piece_len)}, "
                    "length(w) - i + 1)), l -> substring(w, i, l))))"
                )
            ).alias("piece"),
            "cnt",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
    )
    ranked = subs.orderBy(F.desc("n"), F.asc("piece")).limit(int(seed_size))
    singles = subs.filter(F.length("piece") == 1)
    return ranked.unionByName(singles).groupBy("piece").agg(
        F.max("n").alias("n")
    )


def _estep_distributed(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One distributed E-step: Viterbi-segment every word, return the
    cnt-weighted piece counts. Partial aggregation happens INSIDE the
    Arrow batches (a Python dict per task), so the shuffle moves at
    most |vocab| rows per task."""
    import pandas as pd

    max_len = int(max_piece_len)

    def fn(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                seg = _viterbi_pieces(w, logp, max_len)
                if seg is None:  # unseedable char: skip, like the twin
                    continue
                c = int(cnt)
                for p in seg:
                    counts[p] = counts.get(p, 0) + c
        if counts:
            yield pd.DataFrame(
                {"piece": list(counts), "n": list(counts.values())}
            )

    part = words.select("w", "cnt").mapInPandas(fn, "piece string, n long")
    return {
        r["piece"]: int(r["n"])
        for r in part.groupBy("piece").agg(F.sum("n").alias("n")).collect()
    }


def _estep_local(
    rows: list[tuple[str, int]], logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """Driver twin of ``_estep_distributed`` — same DP, same floats."""
    counts: dict[str, int] = {}
    for w, cnt in rows:
        seg = _viterbi_pieces(w, logp, max_piece_len)
        if seg is None:
            continue
        for p in seg:
            counts[p] = counts.get(p, 0) + cnt
    return counts


def _mstep_and_prune(
    counts: dict[str, int],
    vocab: dict[str, float],
    vocab_size: int,
    prune_frac: float,
    final_round: bool,
) -> dict[str, float]:
    """M-step (piece prob = count share) plus one prune round. Unused
    pieces keep a floor just under the minimum used log-prob so a later
    round can resurrect them, except on prune rounds where zero-count
    multi-char pieces are the first to go."""
    total = sum(counts.values())
    if total == 0:
        return vocab
    used = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    floor = min(used.values()) - math.log(2.0)
    new = {
        p: used.get(p, floor)
        for p in vocab
        if len(p) == 1 or p in used or not final_round
    }
    n_multi = sum(1 for p in new if len(p) > 1)
    # vocab_size bounds the MULTI-char pieces; the alphabet (singles)
    # always rides on top — the coverage invariant
    target_multi = vocab_size
    if n_multi > target_multi:
        keep_multi = max(target_multi, int(n_multi * (1.0 - prune_frac)))
        if final_round:
            keep_multi = target_multi
        ranked = sorted(
            (p for p in new if len(p) > 1),
            key=lambda p: (-counts.get(p, 0), p),
        )
        dropped = set(ranked[keep_multi:])
        new = {p: lp for p, lp in new.items() if p not in dropped}
    return new


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    max_piece_len: int = 8,
    seed_size: int = 4096,
    em_iters: int = 4,
    prune_frac: float = 0.25,
    local_threshold: int = LOCAL_VOCAB_MAX,
) -> list[tuple[str, float]]:
    """Train a unigram-LM tokenizer; returns ``[(piece, logprob), ...]``
    sorted by piece (deterministic). ``vocab_size`` bounds the MULTI-
    character pieces kept at the end; single characters always survive
    (coverage), so the returned vocabulary holds at most ``vocab_size``
    multi-char pieces plus the corpus alphabet.

    Adaptive execution, exactly the BPE/k-means pattern: the corpus
    fold to word frequencies and the candidate seeding always run
    distributed; then a word relation at or below ``local_threshold``
    rows trains on the driver in one collect (zero per-iteration Spark
    jobs), while a larger one keeps the distributed EM loop (one
    mapInPandas pass + one vocabulary-sized shuffle per iteration).
    Both paths are pinned count-identical by tests
    (``local_threshold=0`` forces the distributed one).
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if em_iters < 1:
        raise ValueError("em_iters must be >= 1")
    from .bpe import word_counts

    words = (
        word_counts(docs, text_col).select("w", "cnt").localCheckpoint()
    )
    try:
        seed = _seed_vocab(words, max_piece_len, seed_size).collect()
        total = sum(r["n"] for r in seed)
        vocab = {r["piece"]: math.log(r["n"] / total) for r in seed}
        local = words.count() <= local_threshold
        rows = (
            [(r["w"], int(r["cnt"])) for r in words.collect()]
            if local
            else None
        )
        for it in range(em_iters):
            counts = (
                _estep_local(rows, vocab, max_piece_len)
                if local
                else _estep_distributed(words, vocab, max_piece_len)
            )
            vocab = _mstep_and_prune(
                counts, vocab, vocab_size, prune_frac,
                final_round=(it == em_iters - 1),
            )
    finally:
        words.unpersist()
    return sorted(vocab.items())


def unigram_segment(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Apply a trained vocabulary to a corpus: ``(w, pieces)`` per
    distinct word — the Viterbi-best segmentation, the same DP as
    training, shipped as one Arrow-batched pass over the (distinct-
    word-sized) relation."""
    import pandas as pd

    logp = dict(vocab)
    max_len = int(max_piece_len)

    def fn(batches):
        for pdf in batches:
            segs = [
                _viterbi_pieces(w, logp, max_len) for w in pdf["w"]
            ]
            yield pd.DataFrame({"w": pdf["w"], "pieces": segs})

    from ..functions import texthash as TH

    return (
        docs.select(F.explode(TH.tokens(F.col(text_col))).alias("w"))
        .distinct()
        .mapInPandas(fn, "w string, pieces array<string>")
    )
