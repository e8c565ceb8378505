"""Batch event-log analytics: funnel, cohort retention, EWMA —
oracle-differential plus semantic invariants."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match

EVENT_QUERIES = [
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "ewma_daily_revenue",
]


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_eventsql_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_funnel_is_monotone_and_ordered(spark):
    """Stage populations can only shrink, and the ordering constraint
    is real: a user whose purchase precedes every click must not count
    as converted."""
    from map_reduce_library_spark.queries import QUERIES

    rows = sorted(
        QUERIES["funnel_view_click_purchase"](
            spark, SF_CORRECTNESS
        ).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == ["view", "click", "purchase"]
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users
    assert rows[0].pct_of_entry == 1.0

    import datetime as dt

    from map_reduce_library_spark.querydefs.eventsql import (
        funnel_view_click_purchase,
    )

    # Synthetic log exercising the ordering rule directly.
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    ev = spark.createDataFrame(
        [
            # user 1 converts in order
            (1, "view", t), (1, "click", t + s), (1, "purchase", t + 2 * s),
            # user 2 purchases BEFORE clicking -> reaches click only
            (2, "view", t), (2, "purchase", t + s), (2, "click", t + 2 * s),
            # user 3 never clicks
            (3, "view", t), (3, "purchase", t + s),
        ],
        ["user_id", "event_type", "ts"],
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r.stage: r.n_users
        for r in funnel_view_click_purchase(spark, d).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_invariants(spark):
    """Offset-0 retention is 1.0 for every cohort (a user is active in
    their own first week by construction), offsets are non-negative,
    and no cohort exceeds its own size."""
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["cohort_weekly_retention"](
        spark, SF_CORRECTNESS
    ).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        assert 0.0 < r.retention <= 1.0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    for offs in by_cohort.values():
        assert offs[0].retention == 1.0


def test_ewma_bounds_and_smoothing(spark):
    """EWMA stays inside the running min/max envelope of the inputs
    and equals the raw value on day one."""
    from map_reduce_library_spark.queries import QUERIES

    rows = sorted(
        QUERIES["ewma_daily_revenue"](spark, SF_CORRECTNESS).collect(),
        key=lambda r: r.day,
    )
    assert rows
    assert abs(rows[0].ewma - rows[0].day_rev) < 1e-6
    lo = hi = rows[0].day_rev
    for r in rows:
        lo, hi = min(lo, r.day_rev), max(hi, r.day_rev)
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6
