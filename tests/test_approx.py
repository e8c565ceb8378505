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


def test_hll_sketch_rollup_bounds(spark):
    from pyspark.sql import functions as F

    got = {
        r.day: r.approx_users
        for r in QUERIES["hll_sketch_rollup_daily"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    ev = load_table(spark, SF_CORRECTNESS, "events")
    exact = {
        r.day: r.n
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for day, est in got.items():
        assert abs(est - exact[day]) <= max(2, 0.05 * exact[day]), (
            day,
            est,
            exact[day],
        )


def test_heavy_hitters_oracle_and_freqitems_superset(spark):
    from conftest import assert_oracle_match
    from pyspark.sql import functions as F

    assert_oracle_match(spark, "heavy_hitter_tokens")
    # freqItems(support) guarantees a SUPERSET of true heavy hitters.
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    tok = docs.select(F.explode(F.split("text", " ", -1)).alias("token"))
    approx = set(tok.freqItems(["token"], support=0.02).collect()[0][0])
    exact = {
        r.token
        for r in QUERIES["heavy_hitter_tokens"](spark, SF_CORRECTNESS).collect()
    }
    assert exact <= approx
