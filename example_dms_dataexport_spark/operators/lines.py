"""Line-level boilerplate removal (C4 / CCNet / RefinedWeb style).

Web-scale corpora repeat whole LINES across documents — cookie banners,
nav bars, license footers — and the standard fix (C4's "three-sentence"
rule, CCNet's paragraph dedup) is: split every document into lines, count
how many distinct documents each exact line appears in, drop lines above a
document-frequency threshold, and stitch the survivors back together in
their original order.

Scale shape (the part that matters at 100 TB):

- the per-line document-frequency table is built with ONE shuffle on the
  line value; ``countDistinct(id)`` is a partial-aggregated hash count,
  and only lines OVER the threshold survive the filter, so the frequent
  set is tiny relative to the corpus (boilerplate is, by definition, the
  head of the distribution);
- dropping is a ``left_anti`` join of the exploded lines against that
  small frequent set — no hint, so AQE broadcasts it when it fits and
  falls back to a shuffle join when an adversarial corpus makes it large;
- reassembly is one groupBy on the document id: ``collect_list`` of
  (position, line) structs, ``array_sort`` (position is the leading
  struct field), ``array_join``.  Per-document state is bounded by the
  document length, never the corpus.

For truly giant corpora the line VALUE travelling through the first
shuffle can be replaced by a 64-bit line hash (``F.xxhash64``) at the
cost of cross-document hash-collision false drops; this implementation
keeps exact strings so the DuckDB oracle can hash-compare it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _regex_literal(sep: str) -> str:
    """Escape ``sep`` so ``F.split`` (Java regex) treats it literally —
    callers and the DuckDB oracle both treat the separator as a literal
    string, so a sep like ``'.'`` or ``'|'`` must not act as a pattern."""
    return re.sub(r"([\\.\[\]{}()*+?^$|])", r"\\\1", sep)


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_docs: int = 2,
) -> DataFrame:
    """Drop every line that occurs in more than ``max_docs`` distinct
    documents; keep per-document line order.

    Returns one row per input document: (id, n_lines, n_lines_kept,
    clean_text).  Documents whose every line was boilerplate survive with
    ``n_lines_kept = 0`` and an empty ``clean_text`` — dropping whole
    documents is a separate policy decision (compose with a filter).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _regex_literal(sep))).alias(
            "_ln", "line"
        ),
    )
    frequent = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("_ndocs"))
        .filter(F.col("_ndocs") > max_docs)
        .select("line")
    )
    kept = lines.join(frequent, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ln", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        df.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), _regex_literal(sep)))
            .cast("long")
            .alias("n_lines"),
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce(F.col("n_lines_kept"), F.lit(0).cast("long")).alias(
                "n_lines_kept"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
