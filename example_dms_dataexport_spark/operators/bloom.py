"""Bloom-filter semi-join pruning — shuffle-free fact-side reduction.

The classic 100 TB pattern: a semi join of a huge fact table against a
selective dimension subset shuffles the whole fact on the join key. A
Bloom filter built over the dim keys and evaluated fact-side drops the
overwhelming majority of non-matching rows BEFORE the shuffle, so the
exact join that follows only moves candidate rows.

Spark's optimizer has a built-in sibling (`InjectRuntimeFilter`, enabled
via ``spark.sql.optimizer.runtime.bloomFilter.enabled``) that does this
transparently inside one query when thresholds hit. The explicit operator
exists for what the rule can't do: pruning ahead of an aggregation-first
plan, reusing one filter across many queries, and making the reduction
visible/pinnable in tests.

Design (all JVM-side, whole-stage-codegen):
- build: k positions per dim key (double hashing ``h1 + i*h2`` over
  ``xxhash64``) -> (word, bit-mask) pairs -> ``bit_or`` per 64-bit word.
  One shuffle over <= m/64 rows — the dim side, which is small by
  premise.
- probe: the m/64 words are collected (bounded by ``max_bits``; 2^22
  bits = 64 KB) and embedded as ONE array literal — Catalyst constant-
  folds ``array(lit, ...)``, so each fact row pays k ``element_at`` +
  bitwise-AND, no per-row array construction, no broadcast join, no
  extra exchange on the fact.
- exactness: the bloom pass may admit false positives, so the pruned
  fact still flows into the exact ``left_semi`` join; the filter can
  never drop a true match (no false negatives by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _position(cols: list[str], i: int, m: int):
    """Probe i's bit position: an independently-seeded xxhash64 per probe
    (the probe index rides along as an extra hashed column). No
    double-hashing arithmetic — ANSI mode would reject the overflowing
    ``h1 + i*h2`` — and each probe is a single JVM hash call."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(i)), F.lit(m))


def bloom_build(
    dim: DataFrame,
    on: list[str],
    bits_per_key: int = 8,
    max_bits: int = 1 << 22,
) -> tuple[list[int], int, int]:
    """Build a Bloom filter over ``dim``'s ``on`` columns.

    Returns ``(words, m, k)``: the dense 64-bit word list (length m/64),
    the bit count m, and the hash count k. Sizing: ``m = next power of
    two >= n * bits_per_key`` capped at ``max_bits`` (beyond the cap the
    false-positive rate degrades gracefully rather than failing — the
    exact join downstream keeps results correct either way), ``k =
    ln2 * m/n`` clamped to [1, 6] — the design point trades a ~2%
    false-positive rate (harmless: the exact join follows) for fewer
    per-row hash probes.
    """
    n = dim.count()
    if n == 0:
        return [], 64, 1
    m = 64
    while m < n * bits_per_key and m < max_bits:
        m *= 2
    k = max(1, min(6, round(0.693 * m / n)))

    words = (
        dim.select(
            F.explode(
                F.array(*[_position(on, i, m) for i in range(k)])
            ).alias("pos")
        )
        .selectExpr(
            "CAST(pos / 64 AS INT) AS word",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS mask",
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    dense = [0] * (m // 64)
    for r in words:
        dense[r["word"]] = r["bits"]
    return dense, m, k


def bloom_might_contain(words: list[int], m: int, k: int, on: list[str]):
    """Membership predicate Column over ``on`` for a built filter."""
    if not words:
        return F.lit(False)
    # One SQL-parsed literal, not F.lit(list): the latter ships each of the
    # m/64 elements as its own Py4J Literal call (~seconds for 8k words);
    # a single array(...) expression string is one transfer and one parse,
    # and Catalyst still constant-folds it to a Literal.
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    # All k probes share ONE occurrence of the array literal by testing
    # inside a forall lambda — k inlined copies would multiply the plan
    # tree by k*m/64 nodes and tax every analyze/optimize pass.
    positions = F.array(*[_position(on, i, m) for i in range(k)])
    return F.forall(
        positions,
        lambda pos: (
            F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
            .bitwiseAND(_var_shiftleft((pos % F.lit(64)).cast("int")))
            != F.lit(0)
        ),
    )


def _var_shiftleft(bits_col):
    """shiftleft(1L, col) with a column shift amount (the F.shiftleft
    helper only accepts a literal shift)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), bits_col
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    bits_per_key: int = 8,
    max_bits: int = 1 << 22,
) -> DataFrame:
    """Exact ``fact LEFT SEMI JOIN dim ON on`` with bloom pre-pruning.

    The result is identical to a plain semi join; the bloom pass only
    reduces how many fact rows reach the join's shuffle.
    """
    if not on:
        raise ValueError("bloom_semi_join requires at least one key column")
    missing = [c for c in on if c not in fact.columns or c not in dim.columns]
    if missing:
        raise ValueError(f"key columns missing from fact or dim: {missing}")
    words, m, k = bloom_build(dim.select(*on), on, bits_per_key, max_bits)
    pruned = fact.filter(bloom_might_contain(words, m, k, on))
    return pruned.join(dim.select(*on).distinct(), on=on, how="left_semi")
