"""Sketch queries bounded against exact answers. The sketches
themselves register without SQL oracles (HLL/KLL internals differ
across engines — driver records rows-only); their tolerance bands are
anchored by the hash-oracled exact companion queries over the same
grouping keys (``*_exact``)."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match

from map_reduce_library_spark.queries import QUERIES
from map_reduce_library_spark.tables import load_table

EXACT_COMPANIONS = [
    "approx_distinct_users_exact",
    "approx_quantiles_price_exact",
    "hll_sketch_rollup_daily_exact",
]


@pytest.mark.parametrize("name", EXACT_COMPANIONS)
def test_exact_companion_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_distinct_users"](spark, SF_CORRECTNESS).collect()
    }
    exact = {
        r.event_type: r.exact_users
        for r in QUERIES["approx_distinct_users_exact"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    assert set(approx) == set(exact)
    for et, est in approx.items():
        true = exact[et]
        assert abs(est - true) <= max(2, 0.05 * true), (et, est, true)


def test_approx_quantiles_ordered_and_bounded(spark):
    rows = QUERIES["approx_quantiles_price"](spark, SF_CORRECTNESS).collect()
    o = load_table(spark, SF_CORRECTNESS, "orders")
    lo, hi = o.selectExpr("min(o_totalprice)", "max(o_totalprice)").first()
    assert rows
    for r in rows:
        assert lo <= r.p50 <= r.p95 <= r.p99 <= hi


def test_approx_quantiles_near_exact_companion(spark):
    approx = {
        r.o_orderpriority: r
        for r in QUERIES["approx_quantiles_price"](spark, SF_CORRECTNESS).collect()
    }
    exact = {
        r.o_orderpriority: r
        for r in QUERIES["approx_quantiles_price_exact"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    assert set(approx) == set(exact)
    # accuracy=10000 ⟹ rank error <= n/10000 (~2 order statistics at
    # sf0.01) — a tight relative band holds with wide margin.
    for prio, a in approx.items():
        e = exact[prio]
        for q in ("p50", "p95", "p99"):
            av, ev_ = getattr(a, q), getattr(e, q)
            assert abs(av - ev_) <= 0.02 * abs(ev_) + 1e-6, (prio, q, av, ev_)


def test_hll_sketch_rollup_bounds(spark):
    got = {
        r.day: r.approx_users
        for r in QUERIES["hll_sketch_rollup_daily"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    exact = {
        r.day: r.exact_users
        for r in QUERIES["hll_sketch_rollup_daily_exact"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    assert set(got) == set(exact)
    for day, est in got.items():
        assert abs(est - exact[day]) <= max(2, 0.05 * exact[day]), (
            day,
            est,
            exact[day],
        )


def test_heavy_hitters_oracle_and_freqitems_superset(spark):
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
