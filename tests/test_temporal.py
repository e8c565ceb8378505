"""As-of and range joins: oracle-differential + edge semantics."""

import pytest
from conftest import assert_oracle_match

from map_reduce_library_spark.operators.temporal import asof_join, range_join


@pytest.mark.parametrize(
    "name",
    ["asof_last_purchase_before_error", "range_join_purchase_after_error"],
)
def test_temporal_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_asof_join_edges(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 0), "u1"),
         (2, dt(2024, 1, 1, 9, 0), "u1"),
         (3, dt(2024, 1, 1, 10, 0), "u2")],  # u2 has no right rows
        "id long, ts timestamp, user string",
    )
    right = spark.createDataFrame(
        [(dt(2024, 1, 1, 9, 30), "u1", 100.0),
         (dt(2024, 1, 1, 10, 0), "u1", 200.0)],  # exact tie with left id=1
        "ts timestamp, user string, price double",
    )
    out = {
        r.id: r.price_asof
        for r in asof_join(
            left, right, ts="ts", by="user", right_cols=["price"]
        ).collect()
    }
    assert out[1] == 200.0  # at-or-before: exact tie matches
    assert out[2] is None  # nothing before 9:00
    assert out[3] is None  # no right rows for u2


def test_range_join_bucket_boundaries(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 30, 0), "u")],
        "id long, ts timestamp, user string",
    )
    right = spark.createDataFrame(
        [(10, dt(2024, 1, 1, 10, 0, 0), "u"),    # exactly tolerance away
         (11, dt(2024, 1, 1, 9, 59, 59), "u"),   # 1s beyond tolerance
         (12, dt(2024, 1, 1, 10, 30, 0), "u"),   # same instant
         (13, dt(2024, 1, 1, 10, 31, 0), "u")],  # after left (excluded)
        "id long, ts timestamp, user string",
    )
    out = sorted(
        r.r_id
        for r in range_join(
            left, right, ts="ts", by="user", tolerance_seconds=1800,
            left_alias="l", right_alias="r",
        ).collect()
    )
    assert out == [10, 12]


def test_asof_join_attaches_whole_row_not_mixed_columns(spark):
    # When the latest prior right row has NULL in one attached column,
    # that NULL must be attached as-is — never backfilled from an
    # OLDER right row (per-column fills would stitch together columns
    # from different rows; DuckDB ASOF attaches the whole row).
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 12, 0), "u1")],
        "id long, ts timestamp, user string",
    )
    right = spark.createDataFrame(
        [
            (dt(2024, 1, 1, 9, 0), "u1", 100.0, "old"),
            (dt(2024, 1, 1, 11, 0), "u1", None, "new"),  # latest: NULL price
        ],
        "ts timestamp, user string, price double, tag string",
    )
    row = asof_join(
        left, right, ts="ts", by="user", right_cols=["price", "tag"]
    ).collect()[0]
    assert row.tag_asof == "new"
    assert row.price_asof is None  # NOT 100.0 from the older row


def test_scd2_oracle(spark):
    assert_oracle_match(spark, "scd2_user_state_history")


def test_scd2_semantics(spark):
    """Intervals per user tile the timeline: exactly one open
    interval per user, valid_to of each closed interval equals the
    next interval's valid_from, and consecutive intervals never share
    a state (runs are maximal)."""
    import datetime as dt

    from map_reduce_library_spark.queries import QUERIES
    from conftest import SF_CORRECTNESS

    rows = QUERIES["scd2_user_state_history"](
        spark, SF_CORRECTNESS
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: (r.valid_from, r.first_event_id))
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.valid_to == nxt.valid_from
            assert prev.state != nxt.state  # maximal runs


def test_asof_tie_break_is_deterministic(spark):
    """Multiple right rows at the same (by, ts): the greatest
    right-cols tuple wins, stably across partitionings (the
    tie-ambiguous sort previously attached whichever row happened to
    sort last; code-review r6)."""
    left = spark.createDataFrame(
        [(1, 100)], "user_id bigint, ts bigint"
    ).selectExpr("user_id", "timestamp_micros(ts * 1000000) AS ts")
    right = spark.createDataFrame(
        [(1, 50, 7, 1.0), (1, 50, 9, 2.0), (1, 50, 8, 3.0)],
        "user_id bigint, tsec bigint, rid bigint, v double",
    ).selectExpr(
        "user_id", "timestamp_micros(tsec * 1000000) AS ts", "rid", "v"
    )
    from map_reduce_library_spark.operators.temporal import asof_join

    for parts in (1, 7):
        got = asof_join(
            left.repartition(parts),
            right.repartition(parts),
            ts="ts",
            by="user_id",
            right_cols=["rid", "v"],
        ).collect()
        assert len(got) == 1
        assert (got[0].rid_asof, got[0].v_asof) == (9, 2.0)


def test_asof_oracle_data_is_tie_free(spark):
    """The asof oracle uses DuckDB's NATIVE ASOF JOIN, which picks
    arbitrarily among equal-(user, ts) purchases — the differential
    is only meaningful while the testdata has no such ties. Flag the
    latent divergence loudly if the generator ever changes."""
    from tests.conftest import SF_CORRECTNESS

    ev = spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
    dup = (
        ev.where("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .count()
        .where("count > 1")
        .count()
    )
    assert dup == 0, (
        "purchases now contain (user_id, ts) ties; the native-ASOF "
        "oracle is arbitrary on ties - rewrite it as a window with "
        "the operator's greatest-tuple tie-break"
    )
