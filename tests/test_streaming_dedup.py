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
    want = load_table(spark, SF_SMOKE, "events")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
