"""Spec-driven corpus pipeline runner — the one-call composition
surface over the cleaning/dedup/decontam/sampling operator library.

q38/q73 hard-code the canonical chains; real pipelines vary the stages
and their thresholds per corpus. ``run_corpus_pipeline`` takes a plain
list-of-dicts spec (JSON-able except where a stage genuinely needs a
DataFrame or trained model), validates it STRICTLY up front — every
stage name and every parameter key is checked before any Spark work,
so a typo'd threshold fails in milliseconds, not after an hour of
cluster time — and folds the stages into ONE lazy DataFrame: no
materialization between stages, so Catalyst plans the whole pipeline
as a single DAG exactly like the hand-written q38 (stages that
iterate, e.g. near-dup clustering, materialize internally by
construction).

``report=True`` additionally counts rows after each stage — N extra
actions, the audit mode for pipeline development; production runs
leave it off and stay one-action lazy.

Stage catalogue (params beyond these refuse):

    {"op": "quality",       "min_quality": 0.5}
    {"op": "quality_lang",  "min_quality": 0.5, "lang": "en"}
    {"op": "model_quality", "classifier": <train_quality_classifier()>,
                            "min_prob": 0.5}            # threshold cut
    {"op": "model_quality", "classifier": ...,
                            "pareto_alpha": 9.0, "salt": 0}  # GPT-3 cut
    {"op": "exact_dedup"}
    {"op": "model_lang",    "model": train_lang_model(...),
                            "lang": "en", "min_margin": 0.0}
    {"op": "perplexity",    "min_logprob": -3.2}        # CCNet LM band
    {"op": "perplexity",    "lm": train_unigram_lm(ref),
                            "min_logprob": -3.2}        # frozen LM

    {"op": "near_dedup",    "method": "minhash", "threshold": 0.5}
    {"op": "near_dedup",    "method": "simhash", "max_hamming": 8}
    {"op": "near_dedup",    "method": "ngram", "n": 3,
                            "threshold": 0.4}
    {"op": "decontam",      "ref": <DataFrame>, "n": 3, "max_shared": 0}
    {"op": "sample",        "rate": 0.5}
    {"op": "repetition",    "dup_max_pct": 20, "top_max_pct": 6}

Terminal (grain-changing) stages — the training-ingestion tail. They
change the row grain from documents to chunks, so doc-grain filters
cannot follow them; the validator enforces the order (``chunk`` may
only be followed by ``pack``, ``pack`` must follow ``chunk``):

    {"op": "chunk", "chunk_size": 64, "overlap": 0}
    {"op": "pack",  "budget": 256, "n_shards": 8}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, decontam, quality_model, sampling, text_analysis


def _stage_quality(df, p, ctx):
    return text_analysis.quality_filter(
        df, text_col=ctx["text_col"], min_quality=p.get("min_quality", 0.5)
    )


def _stage_quality_lang(df, p, ctx):
    return text_analysis.quality_lang_gate(
        df,
        text_col=ctx["text_col"],
        min_quality=p.get("min_quality", 0.5),
        lang=p.get("lang", "en"),
    )


def _stage_model_quality(df, p, ctx):
    if "classifier" not in p:
        raise ValueError(
            "model_quality needs 'classifier' (train_quality_classifier())"
        )
    if ("min_prob" in p) == ("pareto_alpha" in p):
        raise ValueError(
            "model_quality takes exactly one of 'min_prob' (threshold "
            "cut) or 'pareto_alpha' (reproducible stochastic cut)"
        )
    scored = quality_model.score_quality(
        df, p["classifier"], id_col=ctx["id_col"], text_col=ctx["text_col"]
    )
    if "min_prob" in p:
        keep = scored.filter(F.col("quality_prob") >= p["min_prob"])
    else:
        keep = quality_model.pareto_keep(
            scored,
            alpha=p["pareto_alpha"],
            id_col=ctx["id_col"],
            salt=p.get("salt", 0),
        )
    return df.join(keep.select(ctx["id_col"]), ctx["id_col"], "left_semi")


def _stage_perplexity(df, p, ctx):
    if "min_logprob" not in p and "max_logprob" not in p:
        raise ValueError(
            "perplexity needs 'min_logprob' and/or 'max_logprob'"
        )
    if "lm" in p:
        # frozen-model variant (train_unigram_lm): per-document given
        # the side input, so the stage composes into the ingest stream
        scored = text_analysis.unigram_logprob_frozen(
            df, p["lm"], id_col=ctx["id_col"], text_col=ctx["text_col"]
        )
    else:
        scored = text_analysis.unigram_logprob(
            df, id_col=ctx["id_col"], text_col=ctx["text_col"]
        )
    if "min_logprob" in p:
        scored = scored.filter(F.col("logprob") >= p["min_logprob"])
    if "max_logprob" in p:
        scored = scored.filter(F.col("logprob") <= p["max_logprob"])
    return df.join(scored.select(ctx["id_col"]), ctx["id_col"], "left_semi")


def _stage_model_lang(df, p, ctx):
    if "model" not in p or "lang" not in p:
        raise ValueError(
            "model_lang needs 'model' (train_lang_model()) and 'lang'"
        )
    from . import lang_model

    pred = lang_model.classify_lang(
        df, p["model"], id_col=ctx["id_col"], text_col=ctx["text_col"]
    ).filter(F.col("lang_pred") == p["lang"])
    if "min_margin" in p:
        pred = pred.filter(F.col("margin") >= p["min_margin"])
    return df.join(pred.select(ctx["id_col"]), ctx["id_col"], "left_semi")


def _stage_exact_dedup(df, p, ctx):
    return dedup.exact_dedup(df, id_col=ctx["id_col"], text_col=ctx["text_col"])


def _stage_near_dedup(df, p, ctx):
    method = p.get("method", "minhash")
    idc, txt = ctx["id_col"], ctx["text_col"]
    if method == "minhash":
        pairs = dedup.minhash_dedup_pairs(
            df, id_col=idc, text_col=txt, threshold=p.get("threshold", 0.5)
        )
    elif method == "simhash":
        pairs = dedup.simhash_pairs(
            dedup.simhash(df, id_col=idc, text_col=txt),
            id_col=idc,
            max_hamming=p.get("max_hamming", 8),
        )
    elif method == "ngram":
        pairs = dedup.ngram_jaccard_pairs(
            df,
            id_col=idc,
            text_col=txt,
            n=p.get("n", 3),
            threshold=p.get("threshold", 0.4),
        )
    else:
        raise ValueError(f"near_dedup method {method!r} not in minhash/simhash/ngram")
    return dedup.cluster_survivors(df, pairs, id_col=idc)


def _stage_decontam(df, p, ctx):
    if "ref" not in p or not isinstance(p["ref"], DataFrame):
        raise ValueError("decontam needs 'ref': the held-out DataFrame")
    return decontam.decontaminate(
        df,
        p["ref"],
        id_col=ctx["id_col"],
        text_col=ctx["text_col"],
        n=p.get("n", 3),
        max_shared=p.get("max_shared", 0),
    )


def _stage_sample(df, p, ctx):
    if "rate" not in p:
        raise ValueError("sample needs 'rate'")
    return sampling.hash_sample(df, key_col=ctx["id_col"], rate=p["rate"])


def _stage_repetition(df, p, ctx):
    # repetition_stats keys on doc_id by contract; align the ctx id
    if ctx["id_col"] != "doc_id" and "doc_id" in df.columns:
        raise ValueError(
            "repetition stage: the frame already has a 'doc_id' column "
            f"alongside id_col {ctx['id_col']!r} — renaming would be "
            "ambiguous; drop or rename one of them"
        )
    src = df if ctx["id_col"] == "doc_id" else df.withColumnRenamed(
        ctx["id_col"], "doc_id"
    )
    stats = text_analysis.repetition_stats(
        src,
        text_col=ctx["text_col"],
        dup_max_pct=p.get("dup_max_pct", text_analysis.REP_DUP_MAX_PCT),
        top_max_pct=p.get("top_max_pct", text_analysis.REP_TOP_MAX_PCT),
    )
    bad = stats.filter(~F.col("keep")).select(
        F.col("doc_id").alias(ctx["id_col"])
    )
    return df.join(bad, ctx["id_col"], "left_anti")


def _stage_chunk(df, p, ctx):
    return text_analysis.chunk_tokens(
        df,
        id_col=ctx["id_col"],
        text_col=ctx["text_col"],
        chunk_size=p.get("chunk_size", 64),
        overlap=p.get("overlap", 0),
    )


def _stage_pack(df, p, ctx):
    return text_analysis.pack_chunks(
        df,
        budget=p.get("budget", 256),
        n_shards=p.get("n_shards", 8),
        id_col=ctx["id_col"],
    )


# stages that change the row grain (documents -> chunks -> packed
# chunks); the validator pins them to the spec's TAIL in this order
_TERMINAL_ORDER = ["chunk", "pack"]

_STAGES = {
    "quality": (_stage_quality, {"min_quality"}),
    "quality_lang": (_stage_quality_lang, {"min_quality", "lang"}),
    "model_quality": (
        _stage_model_quality,
        {"classifier", "min_prob", "pareto_alpha", "salt"},
    ),
    "model_lang": (_stage_model_lang, {"model", "lang", "min_margin"}),
    "perplexity": (
        _stage_perplexity,
        {"min_logprob", "max_logprob", "lm"},
    ),
    "exact_dedup": (_stage_exact_dedup, set()),
    "near_dedup": (
        _stage_near_dedup,
        {"method", "threshold", "max_hamming", "n"},
    ),
    "decontam": (_stage_decontam, {"ref", "n", "max_shared"}),
    "sample": (_stage_sample, {"rate"}),
    "repetition": (_stage_repetition, {"dup_max_pct", "top_max_pct"}),
    "chunk": (_stage_chunk, {"chunk_size", "overlap"}),
    "pack": (_stage_pack, {"budget", "n_shards"}),
}


def validate_spec(stages: list[dict]) -> None:
    """Strict up-front validation: unknown stage names, unknown
    parameter keys, AND missing/contradictory required parameters all
    refuse BEFORE any Spark work — in report mode a stage-time error
    would surface only after earlier stages' count jobs ran."""
    if not isinstance(stages, list) or not stages:
        raise ValueError("spec must be a non-empty list of stage dicts")
    for i, st in enumerate(stages):
        if not isinstance(st, dict) or "op" not in st:
            raise ValueError(f"stage {i} must be a dict with an 'op' key")
        op = st["op"]
        if op not in _STAGES:
            raise ValueError(
                f"stage {i}: unknown op {op!r} (known: {sorted(_STAGES)})"
            )
        allowed = _STAGES[op][1]
        extra = set(st) - allowed - {"op"}
        if extra:
            raise ValueError(
                f"stage {i} ({op}): unknown params {sorted(extra)} "
                f"(allowed: {sorted(allowed)})"
            )
        if op == "decontam":
            if "ref" not in st or not isinstance(st["ref"], DataFrame):
                raise ValueError(
                    f"stage {i}: decontam needs 'ref': the held-out "
                    "DataFrame"
                )
        elif op == "sample":
            if "rate" not in st:
                raise ValueError(f"stage {i}: sample needs 'rate'")
        elif op == "model_quality":
            if "classifier" not in st:
                raise ValueError(
                    f"stage {i}: model_quality needs 'classifier' "
                    "(train_quality_classifier())"
                )
            if ("min_prob" in st) == ("pareto_alpha" in st):
                raise ValueError(
                    f"stage {i}: model_quality takes exactly one of "
                    "'min_prob' (threshold cut) or 'pareto_alpha' "
                    "(reproducible stochastic cut)"
                )
        elif op == "model_lang":
            if "model" not in st or "lang" not in st:
                raise ValueError(
                    f"stage {i}: model_lang needs 'model' "
                    "(train_lang_model()) and 'lang'"
                )
        elif op == "perplexity":
            if "min_logprob" not in st and "max_logprob" not in st:
                raise ValueError(
                    f"stage {i}: perplexity needs 'min_logprob' and/or "
                    "'max_logprob'"
                )
        elif op == "near_dedup":
            method = st.get("method", "minhash")
            if method not in ("minhash", "simhash", "ngram"):
                raise ValueError(
                    f"stage {i}: near_dedup method {method!r} not in "
                    "minhash/simhash/ngram"
                )
    # grain-changing stages must form the spec's TAIL, in chunk->pack
    # order: a doc-grain filter after `chunk` would run on chunk rows
    # (wrong columns, wrong semantics), and `pack` consumes exactly
    # chunk_tokens' output
    ops = [st["op"] for st in stages]
    terminal_idx = [i for i, o in enumerate(ops) if o in _TERMINAL_ORDER]
    if terminal_idx:
        tail = ops[terminal_idx[0]:]
        if any(o not in _TERMINAL_ORDER for o in tail):
            raise ValueError(
                "grain-changing stages (chunk/pack) must be the spec's "
                f"tail — found doc-grain stages after {tail[0]!r}"
            )
        if tail != _TERMINAL_ORDER[: len(tail)]:
            raise ValueError(
                f"terminal stages must run in order {_TERMINAL_ORDER} "
                f"(pack consumes chunk's output); got {tail}"
            )


def apply_stage(
    df: DataFrame,
    stage: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply ONE already-validated spec stage. The ingest stream's
    per-stage composition hook: the stream truncates lineage between
    stages (each model stage references its input several times — score
    relation plus semi-join back — so a fully composed spec tree holds
    ~k^stages copies of the batch subtree, and every Catalyst pass over
    it pays for all of them). The batch runner keeps the one-DAG fold
    below; callers here must have run ``validate_spec`` on the full
    spec first."""
    if stage.get("op") not in _STAGES:
        # mirror validate_spec's fail-fast message for callers that
        # skipped it — a bare KeyError here broke the module's
        # descriptive-ValueError discipline (r19 advisor)
        raise ValueError(
            f"unknown stage op {stage.get('op')!r}; "
            f"supported: {sorted(_STAGES)}"
        )
    ctx = {"id_col": id_col, "text_col": text_col}
    return _STAGES[stage["op"]][0](df, stage, ctx)


def run_corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    stages: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    report: bool = False,
):
    """Fold ``stages`` over ``docs``; returns the resulting (lazy)
    DataFrame, or ``(df, report_rows)`` with per-stage in/out counts
    when ``report=True``."""
    validate_spec(stages)
    ctx = {"id_col": id_col, "text_col": text_col}
    df = docs
    rows = []
    for st in stages:
        fn = _STAGES[st["op"]][0]
        n_in = df.count() if report else None
        df = fn(df, st, ctx)
        if report:
            n_out = df.count()
            rows.append({"op": st["op"], "rows_in": n_in, "rows_out": n_out})
    return (df, rows) if report else df


def export_corpus(df: DataFrame, export: dict, id_col: str = "doc_id") -> dict:
    """Hand the pipeline result to a training loader in one call;
    returns the sink's manifest. Formats (each atomic-commit +
    manifest, see the sink modules):

        {"format": "jsonl",      "out_dir": ..., "max_records_per_file": ...}
        {"format": "webdataset", "out_dir": ..., "columns": {...},
                                 "n_shards": ...}
        {"format": "shards",     "warehouse": <ParquetWarehouse>,
                                 "table": ..., "max_records_per_file": ...,
                                 "shuffle_by": [...]}
    """
    fmt = export.get("format")
    allowed = {
        "jsonl": {
            "out_dir",
            "max_records_per_file",
            "shuffle_by",
            "n_tasks",
            "compression",
        },
        "webdataset": {"out_dir", "columns", "n_shards"},
        "shards": {
            "warehouse",
            "table",
            "max_records_per_file",
            "shuffle_by",
            "n_tasks",
        },
    }
    if fmt not in allowed:
        raise ValueError(
            f"export format {fmt!r} not in jsonl/webdataset/shards"
        )
    extra = set(export) - allowed[fmt] - {"format"}
    if extra:
        # same fail-fast discipline as validate_spec: a silently
        # dropped key (a typo, or shuffle_by on the wrong format)
        # would export the WRONG corpus without an error
        raise ValueError(
            f"export ({fmt}): unknown params {sorted(extra)} "
            f"(allowed: {sorted(allowed[fmt])})"
        )
    required = {
        "jsonl": {"out_dir"},
        "webdataset": {"out_dir", "columns"},
        "shards": {"warehouse", "table"},
    }[fmt]
    missing = required - set(export)
    if missing:
        raise ValueError(f"export ({fmt}): missing params {sorted(missing)}")
    kw = {
        k: export[k] for k in export if k not in ("format", "out_dir",
                                                  "columns", "warehouse",
                                                  "table")
    }
    if fmt == "jsonl":
        from ..sources.jsonl import write_jsonl_shards

        return write_jsonl_shards(df, export["out_dir"], **kw)
    if fmt == "webdataset":
        from ..sources.webdataset import write_webdataset

        return write_webdataset(
            df, export["out_dir"], export["columns"], key_col=id_col, **kw
        )
    return export["warehouse"].write_shards(df, export["table"], **kw)
