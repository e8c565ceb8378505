"""Sketch queries bounded against exact answers (no SQL oracle —
sketch impls differ across engines)."""

from conftest import SF_CORRECTNESS

from map_reduce_library_spark.queries import QUERIES
from map_reduce_library_spark.tables import load_table


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_distinct_users"](spark, SF_CORRECTNESS).collect()
    }
    ev = load_table(spark, SF_CORRECTNESS, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg({"user_id": "count"})
        .withColumnRenamed("count(user_id)", "n")
        .collect()
    }
    exact_distinct = {
        r.event_type: r.n
        for r in ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for et, est in approx.items():
        true = exact_distinct[et]
        assert abs(est - true) <= max(2, 0.05 * true), (et, est, true)


def test_approx_quantiles_ordered_and_bounded(spark):
    rows = QUERIES["approx_quantiles_price"](spark, SF_CORRECTNESS).collect()
    o = load_table(spark, SF_CORRECTNESS, "orders")
    lo, hi = o.selectExpr("min(o_totalprice)", "max(o_totalprice)").first()
    assert rows
    for r in rows:
        assert lo <= r.p50 <= r.p95 <= r.p99 <= hi
