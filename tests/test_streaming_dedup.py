"""Streaming dedup (dropDuplicatesWithinWatermark) + foreachBatch sink."""

from conftest import SF_SMOKE, assert_oracle_match

from map_reduce_library_spark.streaming.events import (
    stream_events_to_parquet,
    streaming_dedup,
)
from map_reduce_library_spark.tables import load_table


def test_streaming_dedup_counts_oracle(spark):
    assert_oracle_match(spark, "streaming_dedup_counts")


def test_streaming_dedup_survivors_equal_original(spark):
    got = streaming_dedup(spark, SF_SMOKE)
    want = load_table(spark, SF_SMOKE, "events")
    assert got.count() == want.count()
    # exceptAll is multiset-aware: catches surviving duplicates too.
    assert got.select("event_id").exceptAll(want.select("event_id")).count() == 0


def test_stream_static_join_counts_oracle(spark):
    assert_oracle_match(spark, "stream_static_join_counts")


def test_foreachbatch_parquet_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_events_to_parquet(spark, SF_SMOKE, out, ckpt)
    got = spark.read.parquet(out)
    # batch_id partition dirs are the replay-idempotence layout (a
    # retried batch overwrites its own directory instead of appending
    # a duplicate copy)
    assert "batch_id" in got.columns
    got = got.drop("batch_id")
    want = load_table(spark, SF_SMOKE, "events")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_transform_with_state_matches_batch(spark):
    # transformWithStateInPandas runs a protobuf-speaking Python
    # driver worker; without protobuf the runner crashes at init.
    import pytest

    pytest.importorskip("google.protobuf")
    from map_reduce_library_spark.streaming.events import (
        running_user_totals_tws,
    )
    from pyspark.sql import functions as F

    got = {
        r.user_id: (r.n_events, r.value_micros)
        for r in running_user_totals_tws(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    want = {
        r.user_id: (r.n_events, r.value_micros)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias(
                "value_micros"
            ),
        )
        .collect()
    }
    assert got == want
