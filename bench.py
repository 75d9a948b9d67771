"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized via a pruning-proof hash-reduce: xxhash64 over
every output column, summed. A plain count() lets Catalyst prune the
projection itself, so a narrow map query (e.g. q19's feature expressions)
would measure only the scan; hashing every column forces the full
computed output while still shipping just one row to the driver — mirrors
how a 100 TB run would sink all columns to storage.

Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3); ``queries``
and the headline total report the per-query MEDIAN, ``queries_min`` the
per-query best. Sub-5-second timings at sf0.1 are dominated by ambient
sandbox load (single-shot rounds drifted ~2x with zero plan changes), so
the median is the comparable number and median/min spread is the noise
floor: treat a delta as real only if it clears ``noise.max_median_over_min``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from example_dms_dataexport_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational / pipeline core
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q05_forecast_revenue",
    "q10_top_orders_per_customer",
    "q11_latest_event_per_user",
    "q17_load_plan",
    "q18_cdc_merge",
    # LLM-training-data operators
    "q19_text_features",
    "q22_exact_dedup",
    "q24_minhash_dedup_pairs",
    "q28_knn_brute",
    "q34_sessionize",
    "q38_cleaning_pipeline",
    "q39_asof_attribution",
    "q43_dedup_clusters",
    "q47_line_dedup",
    "q48_unigram_logprob",
    "q49_incremental_rollup",
    "q52_tfidf_top_terms",
    "q53_range_join_windows",
    "q62_funnel_stages",
    "q64_resample_ffill",
    "q65_trailing_hour_avg",
    "q76_snapshot_diff",
    "q80_bloom_semi_join",
    "q83_bm25_rank",
    "q84_quality_percentile",
    # round 6 additions
    "q88_bigram_logprob",
    "q89_retention_cohorts",
    "q93_rolling_active_users",
    "q95_source_token_entropy",
    "q96_value_outliers",
    # round 7 additions
    "q99_quantile_sketch_accuracy",
    "q100_heavy_hitters",
    "q101_token_budget_shards",
    "q102_audio_decode",
    "q103_cms_accuracy",
    "q104_domain_cap",
    "q105_global_shuffle_index",
    "q106_bpe_encode",
    "q107_embedding_moments",
    # round 8 additions (q113 JDBC stays registry-only: its timing is
    # dominated by single-connection Derby inserts, not engine plans)
    "q108_image_decode",
    "q109_salted_join_revenue",
    "q110_time_travel_diff",
    "q111_cluster_canonical",
    "q112_kll_quantile_accuracy",
    # q114: benched below as the q114_bucketed_join_revenue /
    # q114g_bloom_gdpr sentinel PAIR (r17 split) — the r16 fixture fold
    # buried the zero-exchange-join signal under ~4 s of bloom manifest
    # + GDPR materialize; the registered face still composes both for
    # the driver's correctness row.
    "q115_hybrid_retrieval",
    "q116_source_kl_divergence",
    # round 8 ops/compliance faces (registered after the r8 bench froze)
    "q117_cdc_backlog",
    "q118_chunk_integrity",
    "q119_user_erasure_audit",
    "q120_pack_efficiency",
    "q121_scd2_current_view",
    # round 9 additions
    "q122_png_decode",
    "q123_erasure_execution",
    "q124_scd2_delta_apply",
    "q125_group_commit_join",
    "q126_orc_stage_roundtrip",
    "q127_xml_stage_roundtrip",
    "q128_zonemap_prune",
    # round 10 additions (q131_zone_merge_prune excluded like q113/q129:
    # fixture-building dominates; its merge cost is benched by the
    # dedicated q18z_zone_cdc fixture entry instead).
    # q132/q134 (stdlib JPEG decode) are excluded under the same
    # precedent as of round 11: their full-corpus runs are ~236 s of
    # pure-Python eval-grade codec at sf0.1 — 73% of the r10 headline —
    # which buried the engine signal the cross-round methodology tracks.
    # They stay registry faces (full-corpus correctness at sf0.01) and
    # are benched below as q132s/q134s on a deterministic 1-in-25
    # document sample, which keeps a cross-round codec timing without
    # letting fixture-grade compute dominate the headline.
    # Round 11 warehouse faces (q133/q135-q142) follow the q131
    # precedent: fixture-building dominates their face timings, and the
    # engine costs they exercise are benched by the dedicated fixture
    # entries instead (q18p/q18z/q18h/q18s merges, q18d merge-on-read
    # delete, cdc_stream/cdc_group_stream cycles).
    # q143 reads the testdata directly (no fixture) — a headline face
    # like its q46-q58 text-analysis peers.
    "q143_repetition_filter",
    # Round 12: q144-q147 are warehouse fixture faces (q131 precedent —
    # the engine costs are benched by the q18-family sentinels);
    # q148/q149 read the testdata directly, headline faces like q143.
    "q148_dsir_importance_weights",
    "q149_mixture_temperature",
]


def compact_line(result: dict) -> str:
    """The tail-insurance FINAL stdout line (r20 — the r19 verdict's
    "harden the bench artifact contract" item): the driver archives only
    the LAST 2000 chars of stdout, and the r18 round lost every
    per-query round-over-round comparison when the live parse of the
    8.7k-char verbose line failed and the tail alone could not
    reconstruct the medians map.

    This line is a compact SUPERSET of the driver contract — it carries
    every contract field ({metric, value, unit, queries, sf}) so a
    last-line parser sees a complete result — with keys ordered so that
    the trailing ~600 chars are self-sufficient: ``qv`` is the medians
    VALUES in sorted-name order (names are recoverable from the repo's
    HEADLINE list, any BENCH_LOCAL artifact, or this line's own
    ``queries`` map), followed by the calibration/noise scalars and
    ``value``. A full-names medians map cannot fit the 2000-char tail
    (the 77 query names alone are ~1.5k chars), so the guaranteed-
    surviving suffix is the values array: tail-only recovery is
    ``dict(zip(sorted(names), qv))``. tests/test_bench_contract.py pins
    the suffix budget and the qv ordering."""
    names = sorted(result["queries"])
    compact = {
        "metric": result["metric"],
        "unit": result["unit"],
        "method": result["method"],
        "sf": result["sf"],
        "queries": {n: round(result["queries"][n], 2) for n in names},
        # ---- everything from here on fits the 2000-char tail ----
        "qv": [round(result["queries"][n], 2) for n in names],
        "cal": round(result["calibration"]["median_sec"], 3),
        "cal_min": round(result["calibration"]["min_sec"], 3),
        "noise": round(result["noise"]["max_median_over_min"], 3),
        "n_queries": len(names),
        "value": result["value"],
    }
    return json.dumps(compact, separators=(",", ":"))


def materialize(df) -> None:
    """Force full computation of every output column (defeats count()'s
    column pruning) while returning a single row to the driver."""
    from pyspark.sql import functions as F

    # decimal(38,0) sum: a long sum of 64-bit hashes overflows under ANSI
    df.select(F.xxhash64(*df.columns).cast("decimal(38,0)").alias("_h")).agg(
        F.sum("_h")
    ).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    from example_dms_dataexport_spark.registry import load_all

    QUERIES, _ = load_all()

    # r18 registry folds (q121/q110/q126/q127 merged away; q28/q38/q76
    # gained dual-path fold fixtures): the bench keeps every pre-r18
    # series comparable by timing the ORIGINAL single-path bodies under
    # their historical keys — the q114 sentinel-split precedent. The
    # merged faces' extra paths are benched by their own sentinels
    # (ann_ivfpq_build_query) or are correctness-window-only cost.
    from example_dms_dataexport_spark.queries_llm import (
        q19_bench_text_features,
        q24_bench_pairs,
        q28_bench_brute,
        q38_bench_pipeline,
        q48_bench_unigram,
        q88_bench_bigram,
    )
    from example_dms_dataexport_spark.queries_relational import (
        q76_bench_diff,
        q99_bench_hist,
        q110_bench_time_travel,
        q112_bench_kll,
        q121_bench_current_view,
        q126_bench_orc,
        q127_bench_xml,
    )

    OVERRIDES = {
        # r19 folds: q19/q88 retired (absorbed by q20/q48), q24/q48
        # widened with the absorbed relations — the headline keeps the
        # pre-fold single-path bodies under the historical keys
        "q19_text_features": q19_bench_text_features,
        "q24_minhash_dedup_pairs": q24_bench_pairs,
        "q48_unigram_logprob": q48_bench_unigram,
        "q88_bigram_logprob": q88_bench_bigram,
        "q99_quantile_sketch_accuracy": q99_bench_hist,
        "q112_kll_quantile_accuracy": q112_bench_kll,
        "q28_knn_brute": q28_bench_brute,
        "q38_cleaning_pipeline": q38_bench_pipeline,
        "q76_snapshot_diff": q76_bench_diff,
        "q110_time_travel_diff": q110_bench_time_travel,
        "q121_scd2_current_view": q121_bench_current_view,
        "q126_orc_stage_roundtrip": q126_bench_orc,
        "q127_xml_stage_roundtrip": q127_bench_xml,
    }

    def face(name):
        return OVERRIDES.get(name) or QUERIES[name]

    names = [n for n in HEADLINE if n in QUERIES or n in OVERRIDES]
    # Warm the JVM + file-listing caches once with the cheapest query so
    # per-query numbers measure the plan, not session cold-start.
    materialize(face(names[0])(spark, sf_dir))

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # Machine-speed calibration: a FIXED pure-CPU workload (hash-reduce
    # over an in-memory range — no I/O, no engine code, plan-stable
    # across rounds). Cross-round query deltas should be read against
    # the calibration ratio: if calibration_sec moved 1.4x between
    # rounds, the host (shared/noisy-neighbor) moved 1.4x, not the
    # plans. Added round 7 after an ambient ~1.4x host slowdown made
    # every untouched query look regressed.
    from pyspark.sql import functions as F

    def calibrate() -> None:
        (
            spark.range(0, 200_000_000, 1, 32)
            .select(F.xxhash64("id").cast("decimal(38,0)").alias("h"))
            .agg(F.sum("h"))
            .collect()
        )

    calibrate()  # warm

    # Interleaved per-query calibration (round 17, ADDITIVE — the
    # headline stays sum-of-medians over the same runs): a SHORT fixed
    # pure-CPU stanza (1/8th of the end-of-run calibration) runs right
    # after each query invocation, so every query carries the ambient
    # host speed MEASURED AT ITS OWN TIMESLOT. Cross-round, divide a
    # query's delta by its calibration_interleaved ratio before calling
    # it a plan change — the end-of-run calibration can miss a load
    # spike that hit only part of the sweep (the r15/r16 "three closing
    # runs" workaround this replaces).
    def mini_calibrate() -> None:
        (
            spark.range(0, 25_000_000, 1, 32)
            .select(F.xxhash64("id").cast("decimal(38,0)").alias("h"))
            .agg(F.sum("h"))
            .collect()
        )

    mini_calibrate()  # warm the short stanza too
    cal_inter: dict[str, float] = {}

    def timed(fn, cal_key: str | None = None) -> tuple[float, float]:
        """(median, min) wall seconds over n_runs invocations; with
        ``cal_key``, a mini-calibration follows every invocation and
        its median lands in ``cal_inter[cal_key]``."""
        runs, cals = [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
            if cal_key is not None:
                c0 = time.perf_counter()
                mini_calibrate()
                cals.append(time.perf_counter() - c0)
        runs.sort()
        if cal_key is not None:
            cals.sort()
            cal_inter[cal_key] = round(cals[len(cals) // 2], 3)
        return runs[len(runs) // 2], runs[0]

    times: dict[str, float] = {}
    times_min: dict[str, float] = {}
    total = 0.0
    for name in names:
        med, best = timed(
            lambda: materialize(face(name)(spark, sf_dir)), cal_key=name
        )
        times[name] = round(med, 3)
        times_min[name] = round(best, 3)
        total += med

    # Streaming CDC end-to-end at bench scale: q18's change-set served as
    # CSV files through the file source + foreachBatch merge
    # (Trigger.AvailableNow, multiple micro-batches).
    import shutil
    import tempfile

    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_cdc_stream_fixture,
    )

    def run_stream() -> None:
        td = tempfile.mkdtemp(prefix="bench-cdc-")
        try:
            run_cdc_stream_fixture(spark, sf_dir, td)
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_stream, cal_key="cdc_stream_e2e")
    times["cdc_stream_e2e"] = round(med, 3)
    times_min["cdc_stream_e2e"] = round(best, 3)
    total += med

    # Continuous corpus ingest end-to-end (r18 — the r17 streaming
    # surface's first bench sentinel): N micro-batches through the full
    # frozen-side-input spec (quality + NB model_lang + frozen-LM
    # perplexity) into a corpus table whose (doc_id, _fp) bloom
    # manifest batch 0 creates and every append extends — per-sync cost
    # regressions (corpus-wide anti-join shuffles, manifest rebuilds)
    # show up here.
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        prepare_corpus_ingest_inputs,
        run_corpus_ingest_fixture,
    )

    ci_info: dict[str, int] = {}
    # frozen-model training + landing files prep ONCE, untimed (the
    # q131 fixture-cost precedent): the sentinel times the STREAM
    ci_prep = tempfile.mkdtemp(prefix="bench-cing-prep-")
    ci_spec, ci_landing = prepare_corpus_ingest_inputs(spark, sf_dir, ci_prep)

    def run_corpus_ingest() -> None:
        td = tempfile.mkdtemp(prefix="bench-cing-")
        try:
            rows, batches, mfiles, per_batch = run_corpus_ingest_fixture(
                spark, sf_dir, td, spec=ci_spec, landing_glob=ci_landing
            )
            ci_info.update(
                rows_ingested=rows,
                batches=batches,
                manifest_files=mfiles,
                # per-batch wall split (r19): spec / reconcile / append
                # (+ the append's stage/manifest/commit sub-split) so
                # the sentinel's next mover localizes without a rerun
                per_batch=per_batch,
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_corpus_ingest, cal_key="corpus_ingest_e2e")
    shutil.rmtree(ci_prep, ignore_errors=True)
    times["corpus_ingest_e2e"] = round(med, 3)
    times_min["corpus_ingest_e2e"] = round(best, 3)
    total += med

    # Partition-scoped batch CDC (q18's merge against a hive-partitioned
    # target, changes confined to a few buckets): regressions in rewrite
    # amplification / partition pruning show up here, not in q18 (which
    # merges unpartitioned).
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_partitioned_cdc_fixture,
    )

    pcdc_info: dict[str, int] = {}

    def run_pcdc() -> None:
        td = tempfile.mkdtemp(prefix="bench-pcdc-")
        try:
            n, touched, buckets = run_partitioned_cdc_fixture(spark, sf_dir, td)
            pcdc_info.update(
                rows_affected=n,
                touched_partitions=touched,
                total_partitions=buckets,
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_pcdc, cal_key="q18p_partitioned_cdc")
    times["q18p_partitioned_cdc"] = round(med, 3)
    times_min["q18p_partitioned_cdc"] = round(best, 3)
    total += med

    # Zone-map-scoped batch CDC (q18's merge against an UNpartitioned
    # range-clustered target, changes confined to a narrow PK band):
    # regressions back to whole-table merge I/O show up here.
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_zone_cdc_fixture,
    )

    zcdc_info: dict[str, int] = {}

    def run_zcdc() -> None:
        td = tempfile.mkdtemp(prefix="bench-zcdc-")
        try:
            n, carried, files = run_zone_cdc_fixture(spark, sf_dir, td)
            zcdc_info.update(
                rows_written=n, files_carried=carried, total_files=files
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_zcdc, cal_key="q18z_zone_cdc")
    times["q18z_zone_cdc"] = round(med, 3)
    times_min["q18z_zone_cdc"] = round(best, 3)
    total += med

    # Hybrid partition+file CDC (q18's merge against a hive-partitioned
    # AND range-clustered target, changes confined to a narrow band in
    # one partition): regressions back to whole-partition rewrite I/O
    # show up here, not in q18p (which rewrites touched partitions
    # entirely by design).
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_hybrid_cdc_fixture,
    )

    hcdc_info: dict[str, int] = {}

    def run_hcdc() -> None:
        td = tempfile.mkdtemp(prefix="bench-hcdc-")
        try:
            n, carried, files = run_hybrid_cdc_fixture(spark, sf_dir, td)
            hcdc_info.update(
                rows_written=n, files_carried=carried, total_files=files
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_hcdc, cal_key="q18h_hybrid_cdc")
    times["q18h_hybrid_cdc"] = round(med, 3)
    times_min["q18h_hybrid_cdc"] = round(best, 3)
    total += med

    # Scan-scoped CDC (q18's merge against an UNCLUSTERED, map-less
    # target, changes confined to a few keys): the layout-independent
    # touched-file discovery — regressions back to full-table rewrite
    # on retrofitted tables show up here.
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_scan_cdc_fixture,
    )

    scdc_info: dict[str, int] = {}

    def run_scdc() -> None:
        td = tempfile.mkdtemp(prefix="bench-scdc-")
        try:
            n, carried, files = run_scan_cdc_fixture(spark, sf_dir, td)
            scdc_info.update(
                rows_written=n, files_carried=carried, total_files=files
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_scdc, cal_key="q18s_scan_cdc")
    times["q18s_scan_cdc"] = round(med, 3)
    times_min["q18s_scan_cdc"] = round(best, 3)
    total += med

    # Merge-on-read delete + bloom-pruned materialization (q142's
    # machinery at bench scale: a 5%-band delete through the _deletes
    # sidecar, then a materialize that may rewrite ONLY the bloom-hit
    # files) — regressions to whole-table discovery/rewrite show here.
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_mor_delete_fixture,
    )

    mor_info: dict[str, int] = {}

    def run_mor() -> None:
        td = tempfile.mkdtemp(prefix="bench-mor-")
        try:
            k, carried, files = run_mor_delete_fixture(spark, sf_dir, td)
            mor_info.update(
                keys_applied=k, files_carried=carried, total_files=files
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_mor, cal_key="q18d_mor_delete")
    times["q18d_mor_delete"] = round(med, 3)
    times_min["q18d_mor_delete"] = round(best, 3)
    total += med

    # Pending-delete FOLD through a zone-scoped merge (q144's machinery
    # at bench scale: defer-mode GDPR sidecar + live CDC batch on one
    # table) — regressions to refusal, whole-table rewrite, or losing
    # the zone carry show up here (assertions + wall time).
    from example_dms_dataexport_spark.streaming.cdc_fixture import (
        run_fold_cdc_fixture,
    )

    fold_info: dict[str, int] = {}

    def run_fold() -> None:
        td = tempfile.mkdtemp(prefix="bench-fold-")
        try:
            n, rem, carried, files = run_fold_cdc_fixture(spark, sf_dir, td)
            fold_info.update(
                rows_written=n, sidecar_remaining=rem,
                files_carried=carried, total_files=files,
            )
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_fold, cal_key="q18f_fold_cdc")
    times["q18f_fold_cdc"] = round(med, 3)
    times_min["q18f_fold_cdc"] = round(best, 3)
    total += med

    # Stdlib JPEG decode on a deterministic 1-in-25 document sample
    # (the full-corpus faces are correctness-only — see the HEADLINE
    # comment). Same plan shape as q132/q134: per-image parallel
    # mapInPandas, no shuffle; only the fixture volume is reduced.
    from example_dms_dataexport_spark.operators import multimodal
    from example_dms_dataexport_spark.tables import load_table

    def run_jpeg(color: bool) -> None:
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 25 == 0
        )
        fixture = (
            multimodal.jpeg_color_from_documents(docs)
            if color
            else multimodal.jpeg_from_documents(docs)
        )
        materialize(multimodal.decode_jpeg(fixture))

    med, best = timed(lambda: run_jpeg(False), cal_key="q132s_jpeg_decode_sampled")
    times["q132s_jpeg_decode_sampled"] = round(med, 3)
    times_min["q132s_jpeg_decode_sampled"] = round(best, 3)
    total += med
    med, best = timed(lambda: run_jpeg(True), cal_key="q134s_jpeg_color_sampled")
    times["q134s_jpeg_color_sampled"] = round(med, 3)
    times_min["q134s_jpeg_color_sampled"] = round(best, 3)
    total += med

    # q114 sentinel pair (r17 split, r16 verdict What's wrong #2): the
    # zero-exchange bucketed join and the bloom-manifest GDPR
    # materialize timed SEPARATELY. q114_bucketed_join_revenue keeps
    # its pre-r16 meaning (bucketed write + catalog read-back + merge
    # join, ~1 s) so a join-plan regression is visible again; the
    # erasure fold's cost moves to q114g_bloom_gdpr.
    from example_dms_dataexport_spark.queries_relational import (
        q114_bench_join,
        q114g_bench_gdpr,
    )

    med, best = timed(lambda: materialize(q114_bench_join(spark, sf_dir)), cal_key="q114_bucketed_join_revenue")
    times["q114_bucketed_join_revenue"] = round(med, 3)
    times_min["q114_bucketed_join_revenue"] = round(best, 3)
    total += med
    med, best = timed(lambda: materialize(q114g_bench_gdpr(spark, sf_dir)), cal_key="q114g_bloom_gdpr")
    times["q114g_bloom_gdpr"] = round(med, 3)
    times_min["q114g_bloom_gdpr"] = round(best, 3)
    total += med

    # Managed IVF-PQ index end-to-end (train coarse+PQ codebooks, encode,
    # commit hive-partitioned by list, then a pruned nprobe query with
    # exact rerank) — regressions in the ANN build/query path (extra
    # jobs, lost partition pruning, broken broadcast) show up here.
    from example_dms_dataexport_spark.operators import ann_index as _AI
    from example_dms_dataexport_spark.sources.warehouse import (
        ParquetWarehouse as _PW,
    )

    ann_info: dict = {}

    def run_ann() -> None:
        td = tempfile.mkdtemp(prefix="bench-ann-")
        try:
            wh = _PW(td)
            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            ).select("vec_id", "embedding")
            spans: dict = {}
            _AI.build_ann_index(
                wh, emb, "idx", n_lists=8, m=8, k=64, span_sink=spans
            )
            t0 = time.perf_counter()
            probes = emb.filter(F.col("vec_id") % 50 == 0)
            materialize(
                _AI.ann_query(
                    wh, spark, "idx", probes, k=10, nprobe=2,
                    shortlist=40, rerank_with=emb,
                )
            )
            spans["query_s"] = round(time.perf_counter() - t0, 3)
            # per-span wall split (r20, the corpus_ingest.per_batch
            # pattern): train-sample / Lloyd / encode+commit / query,
            # so the sentinel's next mover localizes without a rerun.
            # Observability only — the timed actions are unchanged.
            ann_info.setdefault("spans", []).append(spans)
        finally:
            shutil.rmtree(td, ignore_errors=True)

    med, best = timed(run_ann, cal_key="ann_ivfpq_build_query")
    times["ann_ivfpq_build_query"] = round(med, 3)
    times_min["ann_ivfpq_build_query"] = round(best, 3)
    total += med

    cal_med, cal_best = timed(calibrate)

    spread = max(
        (times[n] / times_min[n]) for n in times if times_min[n] > 0
    )
    # Key order matters: the driver records only the LAST 2000 chars of
    # stdout, which in round 7 silently dropped the headline "value" and
    # the whole "calibration" block (they serialized first). The bulky
    # per-query maps go FIRST and the headline/calibration/noise scalars
    # LAST so any tail cut keeps the numbers the cross-round methodology
    # needs; the complete JSON is also persisted to a committed repo file
    # (BENCH_LOCAL_r{N}.json) as the authoritative artifact.
    result = {
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        # methodology marker: r01-r05 were single-shot sums; r06+
        # sum per-query medians over runs_per_query runs. Cross-
        # round deltas are comparable only within one method.
        "method": "sum_of_medians",
        "sf": sf,
        "runs_per_query": n_runs,
        "partitioned_cdc": pcdc_info,
        "zone_cdc": zcdc_info,
        "hybrid_cdc": hcdc_info,
        "scan_cdc": scdc_info,
        "mor_delete": mor_info,
        "fold_cdc": fold_info,
        "corpus_ingest": ci_info,
        "ann_build_query": ann_info,
        "queries": times,
        "queries_min": times_min,
        # per-query ambient-speed samples taken interleaved with the
        # query's own runs (median of the short stanza; ~1/8th the
        # end-of-run calibration workload). Divide a cross-round query
        # delta by its interleaved-calibration ratio before reading it
        # as a plan change.
        "calibration_interleaved": cal_inter,
        "noise": {
            "max_median_over_min": round(spread, 3),
            "note": (
                "values are per-query medians; deltas below the "
                "median/min spread are ambient-load noise, not "
                "plan changes"
            ),
        },
        "calibration": {
            "median_sec": round(cal_med, 3),
            "min_sec": round(cal_best, 3),
            "note": (
                "fixed pure-CPU hash-reduce (no I/O, no engine "
                "code); divide cross-round query deltas by the "
                "cross-round calibration ratio to remove host-"
                "speed drift"
            ),
        },
        "value": round(total, 3),
    }
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        # Round number for the committed artifact name: an explicit
        # --round N (or SPARK_GRAFT_ROUND) is REQUIRED — the old
        # fallback inference (max CORRECTNESS_r*.json + 1) mislabeled
        # any re-run that happened AFTER the current round's
        # correctness file landed (r10 and r11 verdicts both hit it),
        # so without a round the artifact is simply not written and
        # stdout remains the whole contract.
        n_round = None
        if "--round" in sys.argv:
            # A missing or non-integer value must not crash AFTER the
            # whole bench ran — skip the artifact instead.
            try:
                n_round = int(sys.argv[sys.argv.index("--round") + 1])
            except (IndexError, ValueError):
                print(
                    "warning: --round needs an integer value; "
                    "skipping the BENCH_LOCAL artifact",
                    file=sys.stderr,
                )
        if n_round is None and os.environ.get("SPARK_GRAFT_ROUND"):
            n_round = int(os.environ["SPARK_GRAFT_ROUND"])
        if n_round is not None:
            path = os.path.join(here, f"BENCH_LOCAL_r{n_round:02d}.json")
            with open(path, "w") as f:
                json.dump(result, f, indent=2)
        else:
            print(
                "note: no --round/SPARK_GRAFT_ROUND given; "
                "BENCH_LOCAL artifact not written",
                file=sys.stderr,
            )
    except OSError:
        pass  # persistence is best-effort; stdout remains the contract
    print(json.dumps(result))
    # tail insurance (r20): a compact contract-superset line LAST, so
    # the driver's 2000-char stdout tail always reconstructs the full
    # medians map even if a live parse of the verbose line fails again
    # (the r18 failure mode). ADDITIVE: the verbose line above is
    # unchanged, no timed action moved.
    print(compact_line(result))


if __name__ == "__main__":
    main()
