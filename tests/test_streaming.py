"""Structured Streaming: bounded-stream == batch convergence + custom
stateful operator."""

from conftest import SF_CORRECTNESS, SF_SMOKE, assert_oracle_match

from map_reduce_library_spark.streaming.events import sessionize_stateful
from map_reduce_library_spark.tables import load_table


def test_streaming_hourly_window_oracle(spark):
    # A real readStream→writeStream run, checked against batch SQL.
    assert_oracle_match(spark, "streaming_hourly_window")


def test_sessionize_events_oracle(spark):
    assert_oracle_match(spark, "sessionize_events")


def test_stateful_counts_match_batch(spark):
    got = {
        r.user_id: r.n_events
        for r in sessionize_stateful(spark, SF_SMOKE).collect()
    }
    want = {
        r.user_id: r.cnt
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert got == want
