"""Trainable character-n-gram language identifier — the learned tier
above the stopword-argmax heuristic ``functions.texthash.lang_id``.

This is the classic public pattern (Cavnar & Trenkle 1994 n-gram
profiles; langid.py / fastText's char-n-gram features): multinomial
Naive Bayes over character trigrams with add-one smoothing, trained
from any labeled (text, lang) relation. The heuristic tier needs a
hand-curated stopword list per language; this one learns its profile
from data, covers any label set, and returns calibrated log-odds
margins.

Spark-first shape — training AND scoring are pure DataFrame ops, no
Python in either hot path:

- **Train**: one explode of the labeled corpus into (lang, trigram)
  counts (map-side partial agg), a per-lang top-V cut (window over the
  vocabulary-sized count relation — the langid.py profile truncation,
  which also bounds the model size independently of corpus size), and
  one vocabulary-sized collect. The model is a plain dict, like the PQ
  codebooks: a pure function of the corpus, serializable, versionable.
- **Score**: docs explode to (doc, trigram, count); an equi-join
  against the BROADCAST model relation accumulates the matched term
  ``sum(cnt * (logp - floor))`` per (doc, lang); the unseen-trigram
  mass folds in analytically as ``n_trigrams * floor_lang`` (add-one
  smoothing gives every unseen trigram one fixed per-lang floor, so it
  never needs a per-trigram lookup); argmax via one window. Everything
  is whole-stage-codegen expressions; scoring a 100 TB corpus is one
  explode + one broadcast join + two partial-agg shuffles on doc_id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

UND = "und"
# fixed-point log-prob scale (the q48/q88 LP_SCALE discipline): log-probs
# quantize to integer micro-units at TRAIN time, so every scoring sum is
# exact integer arithmetic — partition-order-independent, and restatable
# in SQL without exposing double-summation order
LM_SCALE = 1_000_000


def char_ngrams(col, n: int = 3):
    """All length-n character substrings of a string column (JVM
    expressions: one sequence + transform, no UDF). The CASE guard
    matters: Spark's ``sequence(1, 0)`` DESCENDS ([1, 0]) rather than
    returning empty, which would fabricate n-grams for short strings.
    The identifier is backtick-quoted: a caller's text column named
    with spaces/dots/reserved words must bind to the column, not break
    the parse (r17 advisor finding)."""
    if "`" in col:
        raise ValueError(f"column name {col!r} contains a backtick")
    q = f"`{col}`"
    return F.expr(
        f"CASE WHEN length({q}) >= {n} THEN "
        f"transform(sequence(1, length({q}) - {n - 1}), "
        f"i -> substring({q}, i, {n})) "
        f"ELSE array() END"
    )


def _doc_tri_counts(
    df: DataFrame, id_cols: list[str], text_col: str, n: int
) -> DataFrame:
    return (
        df.select(*id_cols, F.explode(char_ngrams(text_col, n)).alias("tri"))
        .groupBy(*id_cols, "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_lang_model(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    top_per_lang: int = 2000,
) -> dict:
    """Fit the NB trigram model; returns a plain dict
    ``{"n", "langs": {lang: {"prior", "floor", "total"}},
    "table": [(tri, lang, logp), ...], "vocab_size"}``.

    ``top_per_lang`` truncates each language's profile to its most
    frequent trigrams (ties broken by trigram for determinism) — the
    model stays bounded regardless of corpus size, and truncated mass
    falls into the smoothing floor like any unseen trigram. All
    log-probs use add-one smoothing over the UNION vocabulary, so
    scores are comparable across languages; every log-prob quantizes
    to integer micro-units (LM_SCALE) at train time so downstream
    scoring sums are EXACT — deterministic under any partitioning.
    """
    tri = _doc_tri_counts(labeled, [lang_col], text_col, n).select(
        F.col(lang_col).alias("lang"), "tri", "cnt"
    )
    # per-lang profile truncation: vocabulary-sized window, not corpus-
    # sized. kept feeds THREE actions below (vocab count, totals,
    # collect) — localCheckpoint pins the bounded post-cut relation so
    # the corpus explode + window run exactly once.
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tri"))
    kept = (
        tri.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_per_lang)
        .drop("_rn")
        .localCheckpoint()
    )
    vocab_size = kept.select("tri").distinct().count()
    doc_counts = (
        labeled.groupBy(lang_col)
        .agg(F.count(F.lit(1)).alias("docs"))
        .collect()
    )
    total_docs = sum(r["docs"] for r in doc_counts)
    totals = {
        r["lang"]: r["tot"]
        for r in kept.groupBy("lang").agg(F.sum("cnt").alias("tot")).collect()
    }
    def _micro(x: float) -> int:
        return int(math.floor(x * LM_SCALE + 0.5))

    langs = {}
    for r in doc_counts:
        lg = r[lang_col]
        tot = int(totals.get(lg, 0))
        langs[lg] = {
            "prior": _micro(math.log(r["docs"] / total_docs)),
            "floor": _micro(math.log(1.0 / (tot + vocab_size))),
            "total": tot,
        }
    table = [
        (
            r["tri"],
            r["lang"],
            _micro(
                math.log(
                    (r["cnt"] + 1.0)
                    / (langs[r["lang"]]["total"] + vocab_size)
                )
            ),
        )
        for r in kept.collect()
    ]
    return {"n": n, "langs": langs, "table": table, "vocab_size": vocab_size}


def classify_lang(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, lang_pred, margin): argmax language per document plus the
    log-odds margin over the runner-up (0.0 when only one language is
    modeled). Documents shorter than the n-gram width predict ``und``
    with margin NULL. Ties break lexicographically, and every score is
    an EXACT integer sum of micro-unit log-probs — the classification
    is deterministic under any partitioning (no double-summation
    order), and restatable in SQL for the driver oracle."""
    spark = df.sparkSession
    n = int(model["n"])
    mdl = F.broadcast(
        spark.createDataFrame(
            model["table"], "tri string, lang string, logp long"
        )
    )
    langs = F.broadcast(
        spark.createDataFrame(
            [
                (lg, p["prior"], p["floor"])
                for lg, p in sorted(model["langs"].items())
            ],
            "lang string, prior long, floor long",
        )
    )
    # ONE corpus explode + (doc, tri) shuffle feeds both aggregations:
    # without the lazy checkpoint, n_tri and matched are independent
    # subtrees and Catalyst re-executes the most expensive stage twice
    # per action (the q38 shared-prefix pattern)
    tri = _doc_tri_counts(df, [id_col], text_col, n).localCheckpoint(
        eager=False
    )
    n_tri = tri.groupBy(id_col).agg(F.sum("cnt").alias("_n"))
    # matched mass: only (doc, lang) pairs sharing >=1 modeled trigram —
    # the floor term below covers the rest analytically
    matched = (
        tri.join(mdl, "tri")
        .join(langs.select("lang", "floor"), "lang")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.col("cnt") * (F.col("logp") - F.col("floor"))
            ).alias("_m")
        )
    )
    grid = n_tri.crossJoin(langs)
    scored = (
        grid.join(matched, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            (
                F.col("prior")
                + F.col("_n") * F.col("floor")
                + F.coalesce(F.col("_m"), F.lit(0).cast("long"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("lang"))
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    best = ranked.filter(F.col("_rn") == 1).select(
        id_col, F.col("lang").alias("lang_pred"), F.col("score").alias("_s1")
    )
    second = ranked.filter(F.col("_rn") == 2).select(
        id_col, F.col("score").alias("_s2")
    )
    out = (
        best.join(second, id_col, "left")
        .select(
            id_col,
            "lang_pred",
            (
                F.coalesce(
                    F.col("_s1") - F.col("_s2"), F.lit(0).cast("long")
                ).cast("double")
                / LM_SCALE
            ).alias("margin"),
        )
    )
    # documents with no trigram at all (len < n) never enter the grid
    short = df.select(id_col).join(out.select(id_col), id_col, "left_anti")
    return out.unionByName(
        short.select(
            id_col,
            F.lit(UND).alias("lang_pred"),
            F.lit(None).cast("double").alias("margin"),
        )
    )
