"""Plan-shape tests: pin pushdown, pruning, and join strategy — the
properties that decide whether a query survives a 100x scale-up."""

from __future__ import annotations

from example_dms_dataexport_spark.plans import (
    broadcast_hint_count,
    broadcast_join_count,
    exchange_count,
    physical_plan,
    pushed_filters,
    scan_columns,
)
from example_dms_dataexport_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    qs, _ = load_all()
    return qs[name](spark, SF)


def test_q01_filter_pushed_and_columns_pruned(spark):
    df = _q(spark, "q01_pricing_summary")
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, pushed
    cols = scan_columns(df)[0]
    # 7 needed columns, not all 16 of lineitem
    assert set(cols) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }, cols


def test_q02_dims_are_broadcast(spark):
    df = _q(spark, "q02_revenue_by_nation")
    assert broadcast_join_count(df) >= 3  # customer, nation, region


def test_q05_no_shuffle_before_global_agg(spark):
    df = _q(spark, "q05_forecast_revenue")
    # global scalar agg: partial agg per partition + single-partition final;
    # no hash/range exchange should appear
    assert exchange_count(df) == 0


def test_q28_knn_probes_broadcast_no_shuffle_scoring(spark):
    df = _q(spark, "q28_knn_brute")
    # the brute path's probe slice IS force-broadcast: scoring happens
    # map-side via BroadcastNestedLoopJoin; the only exchange is the
    # window's partition-by-probe shuffle of scored rows
    assert "BroadcastNestedLoopJoin" in physical_plan(df)
    assert broadcast_hint_count(df) == 1
    assert exchange_count(df) <= 1


def test_q30_ivf_join_is_pruned_equi_join(spark):
    df = _q(spark, "q30_knn_ivf")
    pf = pushed_filters(df)
    # label isnotnull pushes to both scans via the equi-join condition
    assert any("label" in f.lower() for f in pf), pf


def test_q29_q30_pruned_paths_never_force_probe_broadcast(spark):
    # corpus-vs-corpus retrieval makes the probe side corpus-sized: a hard
    # broadcast hint on the LSH/IVF paths would OOM at 100 TB. AQE may still
    # CHOOSE broadcast for small inputs — what we pin is the absence of the
    # hint, and that the candidate join is a real equi-join (no cartesian).
    for name in ("q29_knn_lsh", "q30_knn_ivf"):
        df = _q(spark, name)
        assert broadcast_hint_count(df) == 0, name
        assert "CartesianProduct" not in physical_plan(df), name


def test_q27_ngram_prune_is_anti_join_not_broadcast_rare(spark):
    # the rare-n-gram relation grows linearly with the corpus; pruning must
    # be a LEFT ANTI join against the (small) frequent set, never a forced
    # broadcast of rare
    df = _q(spark, "q27_ngram_jaccard_pairs")
    assert broadcast_hint_count(df) == 0
    plan = physical_plan(df)
    assert "LeftAnti" in plan, plan[:2000]


def test_q03_lineitem_filter_pushed(spark):
    df = _q(spark, "q03_top_orders")
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "o_orderdate" in pushed, pushed


def test_q24_no_cartesian_product(spark):
    from example_dms_dataexport_spark.plans import physical_plan

    plan = physical_plan(_q(spark, "q24_minhash_dedup_pairs"))
    assert "CartesianProduct" not in plan
    # band self-join must be a hash/sort-merge EQUI join on the bucket key
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_q34_single_shuffle_sessionize(spark):
    # session assignment + aggregation = one exchange on the session keys
    df = _q(spark, "q34_sessionize")
    assert exchange_count(df) <= 1


def test_q19_text_features_scan_prunes_columns(spark):
    # r19 fold: the q19 face retired into q20 (registry.MERGED); the
    # single-path body is kept as q19_bench_text_features and the scan
    # pruning property is pinned on it
    from example_dms_dataexport_spark.queries_llm import (
        q19_bench_text_features,
    )

    cols = scan_columns(q19_bench_text_features(spark, SF))[0]
    # only doc_id + text are needed from documents (source/n_chars unused)
    assert "text" in cols and "embedding_seed" not in cols


def test_q17_fixture_base_is_cached_single_scan(spark):
    # listing and dms both derive from events; the shared base must be
    # persisted so the parquet scan fills one cache and every downstream
    # branch reads InMemoryTableScan (one physical events read, not two).
    plan = physical_plan(_q(spark, "q17_load_plan"))
    assert "InMemoryTableScan" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import pyspark.sql.functions as F

    from example_dms_dataexport_spark.sources.warehouse import ParquetWarehouse

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    wh.write_bucketed(left, "bleft", ["k"], 4, sort_by=["k"])
    wh.write_bucketed(right, "bright", ["k"], 4, sort_by=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = wh.read_bucketed(spark, "bleft").join(
            wh.read_bucketed(spark, "bright"), "k"
        )
        # co-located: bucket files join directly, zero exchange either side
        assert exchange_count(j) == 0, physical_plan(j)
        assert j.count() == 1000
        # fresh-session path: drop the catalog entries, re-register from
        # the persisted _bucket_spec.json — still shuffle-free
        spark.sql("DROP TABLE wh_bleft")
        spark.sql("DROP TABLE wh_bright")
        j2 = wh.read_bucketed(spark, "bleft").join(
            wh.read_bucketed(spark, "bright"), "k"
        )
        assert exchange_count(j2) == 0, physical_plan(j2)
        assert j2.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q48_vocab_join_broadcasts_not_forced(spark):
    # the token stream must NOT shuffle for the vocab join: the
    # vocabulary-sized lp relation is broadcast (chosen, never forced);
    # shuffles are: vocab groupBy + final per-doc agg. Pinned on the
    # single-path unigram body (the r19 fold joined the bigram relation
    # onto the registered face; its plan is covered below).
    from example_dms_dataexport_spark.queries_llm import q48_bench_unigram

    df = q48_bench_unigram(spark, SF)
    assert broadcast_hint_count(df) == 0
    assert broadcast_join_count(df) >= 1
    assert exchange_count(df) == 2, physical_plan(df)


def test_q48_merged_face_no_forced_broadcast(spark):
    # the r19-merged face (unigram ⋈ bigram per doc): still no pinned
    # broadcasts, no cartesian — AQE owns the model-side join strategy
    df = _q(spark, "q48_unigram_logprob")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0


def test_q47_line_dedup_no_forced_broadcast(spark):
    # frequent-line set rides an AQE-chosen broadcast; no hard hints
    df = _q(spark, "q47_line_dedup")
    assert broadcast_hint_count(df) == 0
    assert "CartesianProduct" not in physical_plan(df)


def test_q49_incremental_rollup_never_rescans_wide_fact(spark):
    # the operator input relations are aggregate/change-set-sized; the
    # merge join carries no forced hint and no cartesian blowup
    df = _q(spark, "q49_incremental_rollup")
    assert broadcast_hint_count(df) == 0
    assert "CartesianProduct" not in physical_plan(df)


def test_q53_range_join_is_bucketed_equi_join(spark):
    # the bucketed range join must plan as an equi-join on the derived
    # bucket key — never a cartesian / nested-loop pair scan, and with no
    # forced broadcast (AQE may still choose one for the window side)
    df = _q(spark, "q53_range_join_windows")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert broadcast_hint_count(df) == 0


def test_q57_kmeans_final_assign_is_joinless_scan(spark):
    # centroids are driver-collected literals: the returned assignment
    # plan is a pure projection over the scan — no join of any kind, no
    # exchange, no hints
    df = _q(spark, "q57_kmeans_assign")
    plan = physical_plan(df)
    assert broadcast_hint_count(df) == 0
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert exchange_count(df) == 0, plan


def test_q58_embedding_decontam_is_bucket_equi_join(spark):
    df = _q(spark, "q58_embedding_decontam")
    plan = physical_plan(df)
    assert broadcast_hint_count(df) == 0
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q59_histogram_single_pass_plus_broadcast(spark):
    # the only forced broadcast is the 1-row min/max bound relation
    df = _q(spark, "q59_histogram_totalprice")
    assert broadcast_hint_count(df) == 1
    assert "CartesianProduct" not in physical_plan(df)


def test_q60_q66_single_shuffle_grouping_sets(spark):
    # pivot(+in-stage unpivot Expand) and grouping-sets cube both
    # aggregate with map-side partials into ONE hash-partitioned
    # exchange (q61's cube folded into q66 in r18 — the DataFrame-cube
    # twin is identity-asserted inside the face)
    for name in ("q60_pivot_lang_source", "q66_grouping_sets"):
        df = _q(spark, name)
        assert exchange_count(df) == 1, (name, physical_plan(df))


def test_q62_to_q65_shapes(spark):
    # funnel: dependent agg chain, all keyed on user — joins/aggs only,
    # no cartesian, no forced broadcast
    df = _q(spark, "q62_funnel_stages")
    assert broadcast_hint_count(df) == 0
    assert "CartesianProduct" not in physical_plan(df)
    assert exchange_count(df) <= 6
    # set ops compile to dedup + semi/anti joins: one exchange per side
    assert exchange_count(_q(spark, "q63_intersect_except")) == 2
    # resample: span agg + the as-of union's window shuffle, nothing else
    assert exchange_count(_q(spark, "q64_resample_ffill")) == 2
    # RANGE-frame moving agg: the single user_id window shuffle
    assert exchange_count(_q(spark, "q65_trailing_hour_avg")) == 1


def test_q73_corpus_build_no_cartesian_no_hints(spark):
    # seven composed stages must stay hint-free and cartesian-free end
    # to end (the MinHash band join, decontam gram join, and chunk
    # explode are all equi/generator shapes)
    df = _q(spark, "q73_corpus_build")
    plan = physical_plan(df)
    assert broadcast_hint_count(df) == 0
    assert "CartesianProduct" not in plan


def test_q83_bm25_stats_broadcast_no_wide_shuffle(spark):
    df = _q(spark, "q83_bm25_rank")
    plan = physical_plan(df)
    # per-doc tf/dl are in-row array expressions; the only join is the
    # 1-row corpus-stats broadcast (BroadcastNestedLoopJoin of a scalar
    # relation), and the only exchange feeds that 1-row aggregate
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert exchange_count(df) <= 1, physical_plan(df)


def test_q84_percentile_no_row_level_window(spark):
    df = _q(spark, "q84_quality_percentile")
    plan = physical_plan(df)
    # the window must run over the compressed (lang, quality) counts, so a
    # partial (map-side) aggregate precedes the first exchange, and the
    # rank join-back is not a forced broadcast
    assert plan.count("Window") >= 1
    assert "partial" in plan.lower(), plan
    assert broadcast_hint_count(df) == 0
    assert exchange_count(df) <= 3, plan


def test_q86_split_no_cartesian_cluster_join_not_forced(spark):
    df = _q(spark, "q86_leakage_safe_split")
    plan = physical_plan(df)
    # the doc->cluster-label join must stay an equi join on doc_id (the
    # label side is pairs-sized; AQE may broadcast it at runtime) — never
    # a cartesian, and never a forced broadcast pinned into the plan
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0


def test_q87_sketch_join_is_broadcast_estimate_side(spark):
    df = _q(spark, "q87_sketch_accuracy")
    plan = physical_plan(df)
    # BOTH estimate relations (grain rollup + the r18-folded q92
    # parity-half merge) are per-event-type tiny and join back to the
    # exact counts via explicit broadcasts — the fact table is never
    # reshuffled for the comparison
    assert broadcast_join_count(df) >= 2
    assert "CartesianProduct" not in plan


def test_q88_bigram_model_joins_not_forced(spark):
    # q88 retired into q48 (r19 fold); the single-path body keeps the
    # plan property pinned under its historical name
    from example_dms_dataexport_spark.queries_llm import q88_bench_bigram

    df = q88_bench_bigram(spark, SF)
    plan = physical_plan(df)
    # model sides are vocab-sized: joins must stay equi (AQE decides
    # broadcast at runtime), never cartesian or pinned broadcast
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0


def test_q89_retention_collapses_facts_first(spark):
    df = _q(spark, "q89_retention_cohorts")
    plan = physical_plan(df)
    # the only fact-sized shuffle feeds the DISTINCT (user, day)
    # collapse; everything after runs on user- or matrix-sized relations
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0
    assert "partial" in plan.lower()  # map-side partials before exchanges


def test_q90_q91_no_cartesian_no_hints(spark):
    for name in ("q90_value_deciles", "q91_event_path_patterns"):
        df = _q(spark, name)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, name
        assert broadcast_hint_count(df) == 0, name


def test_q93_shapes(spark):
    # (q92's merged-sketch shape folded into q87's test above, r18)
    df = _q(spark, "q93_rolling_active_users")
    plan = physical_plan(df)
    # r19 one-pass shape: the 7x fan-out runs on the DISTINCT (user, day)
    # relation, dau folds into the SAME day aggregation as wau, and the
    # max-day trim is an unbounded window over the day-cardinality result
    # — NO joins of any kind remain (the old shape re-derived the distinct
    # relation three times and attached the bound via a 1-row BNLJ)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert broadcast_hint_count(df) == 0
    assert "Window" in plan


def test_q94_q95_shapes(spark):
    df = _q(spark, "q94_value_trend_regression")
    plan = physical_plan(df)
    # min-day is a 1-row broadcast scalar attach; sums are one shuffle
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) + ("BroadcastNestedLoopJoin" in plan) >= 1

    df = _q(spark, "q95_source_token_entropy")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0
    assert "partial" in plan.lower()  # map-side combine on the token stream


def test_q96_q97_shapes(spark):
    df = _q(spark, "q96_value_outliers")
    plan = physical_plan(df)
    # per-dimension moments broadcast back onto the fact scan
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plan

    df = _q(spark, "q97_weekly_value_wow")
    plan = physical_plan(df)
    # the lag window runs over the (dimension, week) relation
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan


def test_q98_matrix_no_cartesian(spark):
    df = _q(spark, "q98_cross_source_dup_matrix")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0
    # the source-attach joins are pure equi joins on doc id — a non-equi
    # join here would mean the pair list stopped being the small keyed
    # relation and the matrix degenerated toward all-pairs
    assert "BroadcastNestedLoopJoin" not in plan
    # matrix aggregation map-side combines before the source-pair shuffle
    assert "partial" in plan.lower()


def test_q99_sketch_estimate_broadcast_no_cartesian(spark):
    # single-path histogram body (the r19 fold unions the KLL contract
    # onto the registered face; each section keeps its own plan pin)
    from example_dms_dataexport_spark.queries_relational import (
        q99_bench_hist,
    )

    df = q99_bench_hist(spark, SF)
    plan = physical_plan(df)
    # the (groups x bins)-sized estimate relation broadcasts back onto
    # the exact side; no cartesian anywhere
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) >= 1
    assert broadcast_hint_count(df) == 1
    # the merged face (hist ∪ kll sections) stays cartesian-free
    assert "CartesianProduct" not in physical_plan(
        _q(spark, "q99_quantile_sketch_accuracy")
    )


def test_q101_shard_cumsum_is_two_level_not_global_window(spark):
    df = _q(spark, "q101_token_budget_shards")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the only forced broadcast is the n_buckets-row offsets relation
    assert broadcast_hint_count(df) == 1
    # the fact-side running sum is partitioned by bucket — the global
    # (unpartitioned) window exists only over the n_buckets offset rows,
    # never over the fact table: fact-sized shuffles are the bucket
    # groupBy and the bucket-partitioned window, nothing more
    assert exchange_count(df) <= 2, plan


def test_q104_domain_cap_single_shuffle_no_cartesian(spark):
    df = _q(spark, "q104_domain_cap")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # preprune is a shuffle-free mapInPandas; the only exchange is the
    # rank window's partition-by-source shuffle (over pruned rows)
    assert exchange_count(df) == 1, plan
    assert broadcast_hint_count(df) == 0


def test_cms_sketch_and_lookup_shapes(spark):
    from pyspark.sql import functions as F

    from example_dms_dataexport_spark.operators import freq

    items = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50)).alias("item")
    )
    state = freq.cms_sketch(items, "item")
    # state build: the explode stays narrow; one sketch-sized shuffle
    assert exchange_count(state) == 1
    est = freq.cms_lookup(state, items.distinct(), "item")
    plan = physical_plan(est)
    assert "CartesianProduct" not in plan
    # probes join the (<= depth*width)-row state broadcast, never shuffled
    assert broadcast_hint_count(est) == 1


def test_q105_shuffle_index_no_global_window(spark):
    df = _q(spark, "q105_global_shuffle_index")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the scale contract: a range exchange + per-partition Arrow
    # assignment — never a Window or single-partition sort over the corpus
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert broadcast_hint_count(df) == 0


def test_q106_bpe_encode_segmentation_join_not_forced(spark):
    df = _q(spark, "q106_bpe_encode")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # vocab-sized segmentation table joins the exploded corpus as a
    # plain equi-join — planner's choice, never a forced broadcast
    assert broadcast_hint_count(df) == 0


def test_q107_moments_single_shuffle_partial_agg(spark):
    df = _q(spark, "q107_embedding_moments")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # posexplode widens in-row; partial aggregation collapses to d groups
    # before the one d-key shuffle
    assert exchange_count(df) == 1, plan
    assert "partial" in plan.lower(), plan


def test_salted_join_plan_no_cartesian_no_forced_broadcast(spark):
    from example_dms_dataexport_spark.operators.skewjoin import salted_join

    left = spark.range(1000).selectExpr("id AS rid", "id % 3 AS k")
    right = spark.range(50).selectExpr("id % 3 AS k", "id AS val")
    df = salted_join(left, right, ["k"], salt=8)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert broadcast_hint_count(df) == 0
    # the salt replication is an in-row explode, never a shuffle to build
    assert "Generate" in plan, plan


def test_kll_sketch_pipeline_single_exchange(spark):
    from example_dms_dataexport_spark.operators import kll
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    sk = kll.kll_merge(kll.kll_sketch(df, ["g"], "v"), ["g"])
    plan = physical_plan(sk)
    assert "CartesianProduct" not in plan
    # partial sketches build shuffle-free; only sketch-sized rows cross
    # the one group-merge exchange
    assert exchange_count(sk) == 1, plan


def test_q112_kll_plan(spark):
    # q112 retired into q99 (r19 fold); the single-path body keeps the
    # plan property pinned under its historical name
    from example_dms_dataexport_spark.queries_relational import (
        q112_bench_kll,
    )

    df = q112_bench_kll(spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the rank-span verification joins the tiny estimate relation to the
    # fact table via an explicit broadcast — the fact side never shuffles
    # for the join
    assert broadcast_hint_count(df) == 1, plan


def test_q108_image_decode_no_shuffle(spark):
    df = _q(spark, "q108_image_decode")
    plan = physical_plan(df)
    # encode -> parse -> features is a pure narrow pipeline: Arrow-batched
    # mapInPandas stages over the scan, nothing ever shuffles
    assert exchange_count(df) == 0, plan
    assert "CartesianProduct" not in plan


def test_q110_time_travel_diff_plan(spark):
    # q110 folded into q76 (r18): the bench body keeps the original
    # fixture/plan, and q76's registered face now reads both snapshots
    # back through the versioned-commit protocol — same diff shape.
    from example_dms_dataexport_spark.queries_relational import (
        q110_bench_time_travel,
    )

    for df in (
        q110_bench_time_travel(spark, SF),
        _q(spark, "q76_snapshot_diff"),
    ):
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        # one full-outer PK sort-merge join of the two snapshots — the
        # minimum possible work for a diff (one exchange per side)
        assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan, plan
        assert exchange_count(df) == 2, plan


def test_q113_jdbc_pushdown_plan(spark):
    df = _q(spark, "q113_jdbc_roundtrip")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the totalprice filter must reach the REMOTE SQL, not run Spark-side
    # after a full-table fetch
    assert "PushedFilters:" in plan and "o_totalprice" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0], plan


def test_q115_hybrid_no_corpus_window(spark):
    df = _q(spark, "q115_hybrid_retrieval")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # each channel ends in a TakeOrdered top-k; the only row windows run
    # over k-row relations, never the corpus
    assert "TakeOrderedAndProject" in plan, plan


def test_q114_bucketed_join_plan(spark):
    df = _q(spark, "q114_bucketed_join_revenue")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan, plan
    # co-located bucket layout: the join reads bucket files directly on
    # BOTH sides; the only exchange in the plan is the final segment
    # aggregation
    assert exchange_count(df) == 1, plan


def test_q122_png_decode_no_shuffle(spark):
    df = _q(spark, "q122_png_decode")
    plan = physical_plan(df)
    # encode -> inflate/unfilter -> features is a pure narrow pipeline
    # (the q108 shape): Arrow-batched mapInPandas over the scan, nothing
    # ever shuffles
    assert exchange_count(df) == 0, plan
    assert "CartesianProduct" not in plan


def test_q123_erasure_plan(spark):
    df = _q(spark, "q123_erasure_execution")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the re-audit semi join broadcasts the subject list (the fact side
    # never shuffles for it); the only BNLJ is the documented 1-row
    # scalar attach of `remaining`
    assert broadcast_hint_count(df) == 1, plan


def test_scd2_apply_delta_history_never_shuffles(spark, tmp_path):
    """The 100 TB claim behind q124: given a MATERIALIZED history, the
    delta fold shuffles only the (touched open rows + batch) window
    input — the history passes through broadcast anti/semi flag joins
    with zero exchange of its own."""
    from example_dms_dataexport_spark.operators.scd import scd2_apply_delta

    hist = spark.createDataFrame(
        [(1, "a", 1, None)],
        "k int, tier string, valid_from int, valid_to int",
    )
    hist.write.mode("overwrite").parquet(str(tmp_path / "hist"))
    hist = spark.read.parquet(str(tmp_path / "hist"))
    batch = spark.createDataFrame(
        [(1, "b", 2, 1)], "k int, tier string, ts int, eid int"
    )
    out = scd2_apply_delta(hist, batch, ["k"], "ts", ["tier"], ["eid"])
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # key-set broadcasts: anti (untouched), semi (closed), semi (seed)
    assert broadcast_hint_count(out) == 3, plan
    # ONE data shuffle end-to-end: the tail compression's key window.
    # (batch.distinct() for the key set adds its own exchanges but only
    # batch-key-sized rows cross them.)
    n_window_exchanges = sum(
        1 for ln in plan.splitlines()
        if "Exchange hashpartitioning(k" in ln
    )
    assert n_window_exchanges <= 2, plan


def test_q125_group_commit_join_plan(spark):
    df = _q(spark, "q125_group_commit_join")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the members resolve to plain parquet snapshot scans joined on the
    # customer key — an equi-join (broadcast or sort-merge, AQE's call),
    # never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q109_salted_join_plan(spark):
    from example_dms_dataexport_spark.operators.skewjoin import SALT_COL

    df = _q(spark, "q109_salted_join_revenue")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the merge hint pins sort-merge — the 100 TB strategy — so the
    # small dimension is NOT statically broadcast and the salt actually
    # spreads the join's shuffle keys
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert SALT_COL in plan, plan  # salt participates in the join keys
    assert "Generate" in plan, plan  # replication is an in-row explode


def test_q126_orc_stage_plan(spark):
    # the ORC fixture lives on as a bench body inside the r18-merged
    # q126_stage_format_roundtrips face — its plan pins unchanged
    from example_dms_dataexport_spark.queries_relational import (
        q126_bench_orc,
    )

    df = q126_bench_orc(spark, SF)
    plan = physical_plan(df)
    # the stage read is a native columnar ORC scan, not a text fallback
    assert "orc" in plan.lower(), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly three data shuffles: the per-file rownum window's
    # hashpartitioning(_dms_filename), the distinct-(file, rownum)
    # guard's dedup exchange, and the final nation aggregation
    assert exchange_count(df) == 3, plan
    # the guard's window must SURVIVE column pruning (it feeds the
    # projected n_suppliers through the assert_true coalesce)
    assert "Window" in plan, plan


def test_q127_xml_stage_plan(spark):
    from example_dms_dataexport_spark.queries_relational import (
        q127_bench_xml,
    )

    df = q127_bench_xml(spark, SF)
    plan = physical_plan(df)
    # schema-driven native XML scan (Spark 4 built-in source)
    assert "xml" in plan.lower(), plan
    assert "CartesianProduct" not in plan
    # no rownum window in this face: the ONLY shuffle is the segment agg
    assert exchange_count(df) == 1, plan


def test_q126_merged_face_unions_all_three_formats(spark):
    # the registered face is the tagged union of the three fixtures —
    # every format's scan must appear in ONE plan, still cartesian-free
    df = _q(spark, "q126_stage_format_roundtrips")
    plan = physical_plan(df)
    low = plan.lower()
    assert "orc" in low and "xml" in low and "avro" in low or "union" in low
    assert "CartesianProduct" not in plan


def test_q128_zonemap_prune_plan(spark):
    df = _q(spark, "q128_zonemap_prune")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pruned file-list scan + residual filter + ONE agg shuffle; the
    # face itself guards that the planned file set is a strict subset
    assert exchange_count(df) == 1, plan


def test_q129_declared_layout_pipeline_plan(spark):
    df = _q(spark, "q129_declared_layout_pipeline")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the returned read is a pruned parquet scan + ONE agg shuffle; all
    # pipeline work (load/merge/layout) happened before the plan
    assert exchange_count(df) == 1, plan


def test_q130_zorder_multicol_prune_plan(spark):
    df = _q(spark, "q130_zorder_multicol_prune")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pruned file-list scan + residual filters + ONE agg shuffle; the
    # face's guards already pinned strict-subset conjunctive planning
    assert exchange_count(df) == 1, plan
