"""Streaming Python DataSource: offset tracking, restart recovery,
exactly-once delivery across availableNow drains."""

from __future__ import annotations

import pytest

from map_reduce_library_spark.sources.pystream import (
    register_tick_stream,
)

BATCH, LIMIT = 10, 50


def _drain_once(spark, out_dir: str, cp_dir: str) -> None:
    q = (
        spark.readStream.format("tickstream")
        .option("batch", BATCH)
        .option("limit", LIMIT)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tick_stream_exactly_once_across_restarts(spark, tmp_path):
    """Each availableNow start consumes from the COMMITTED offset and
    advances one batch; after ceil(limit/batch) starts the feed is
    drained, and further starts deliver nothing. Every row arrives
    exactly once — the offset protocol, not luck."""
    register_tick_stream(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    for _ in range(LIMIT // BATCH + 2):  # 2 extra no-op drains
        _drain_once(spark, out, cp)
    rows = spark.read.parquet(out).collect()
    assert sorted((r.i, r.payload) for r in rows) == [
        (i, f"tick-{i:05d}") for i in range(LIMIT)
    ]


def test_tick_stream_single_start_reads_one_batch(spark, tmp_path):
    """A single availableNow start on a fresh checkpoint commits
    exactly one micro-batch of `batch` rows (the simple-reader
    prefetch contract)."""
    register_tick_stream(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    _drain_once(spark, out, cp)
    assert spark.read.parquet(out).count() == BATCH
