"""Oracle-differential tests for corpus part 10 (sf0.01), plus
semantic spot-checks the hash alone wouldn't explain."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match

QUERIES = [
    "edit_distance_near_dups",
    "gap_fill_daily_revenue",
    "null_safe_join_counts",
    "trailing_window_7d",
    "correlated_above_customer_avg",
    "union_by_name_evolution",
    "try_cast_gauntlet",
    "set_ops_bag_semantics",
]


@pytest.mark.parametrize("name", QUERIES)
def test_relational10_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_gap_fill_spine_is_dense_and_zero_filled(spark):
    """Every calendar day between min and max appears exactly once, and
    days absent from orders carry revenue 0.0 / n_orders 0."""
    from map_reduce_library_spark.queries import QUERIES as Q

    rows = Q["gap_fill_daily_revenue"](spark, SF_CORRECTNESS).collect()
    days = sorted(r["day"] for r in rows)
    assert len(days) == len(set(days))
    span_days = (days[-1] - days[0]).days + 1
    assert len(days) == span_days  # dense: no calendar gaps
    gaps = [r for r in rows if r["n_orders"] == 0]
    assert gaps, "sf0.01 orders leave at least one empty calendar day"
    assert all(r["revenue"] == 0.0 for r in gaps)


def test_null_safe_join_keeps_masked_nation(spark):
    """The NULL-masked key (nation 0) still matches its customers —
    the distinguishing behavior vs a plain equi-join."""
    from map_reduce_library_spark.queries import QUERIES as Q

    rows = {
        r["n_name"]: r
        for r in Q["null_safe_join_counts"](spark, SF_CORRECTNESS).collect()
    }
    null_rows = [r for r in rows.values() if r["key_was_null"]]
    assert len(null_rows) == 1
    assert null_rows[0]["num_customers"] > 0


def test_edit_distance_pairs_are_ordered_and_thresholded(spark):
    from map_reduce_library_spark.queries import QUERIES as Q

    rows = Q["edit_distance_near_dups"](spark, SF_CORRECTNESS).collect()
    assert rows, "sf0.01 documents contain near-dup pairs under the block"
    assert all(r["doc_id_a"] < r["doc_id_b"] for r in rows)
    assert all(0 <= r["lev_dist"] <= 40 for r in rows)


def test_trailing_window_monotone_count_within_burst(spark):
    """n_events_7d counts every event in the trailing week including
    the current row, so it is >= 1 everywhere and equals the full
    per-user prefix count whenever the user's history fits in 7 days."""
    from map_reduce_library_spark.queries import QUERIES as Q

    rows = Q["trailing_window_7d"](spark, SF_CORRECTNESS).collect()
    assert all(r["n_events_7d"] >= 1 for r in rows)


def test_correlated_threshold_filters_strictly(spark):
    from map_reduce_library_spark.queries import QUERIES as Q

    df = Q["correlated_above_customer_avg"](spark, SF_CORRECTNESS)
    total = df.count()
    assert 0 < total  # some orders beat 1.5x their customer average
