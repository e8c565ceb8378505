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


def test_python_stream_source_to_python_stream_sink(spark, tmp_path):
    """Full-Python streaming pipeline: the tickstream SOURCE feeding
    the jsonlines STREAM SINK — both ends of the connector surface in
    one query. Epoch manifests are the read contract; union of their
    part lists is the exactly-once output."""
    import json
    import os

    from map_reduce_library_spark.sources.pysink import (
        JsonLinesSink,
        read_stream_manifests,
    )

    register_tick_stream(spark)
    spark.dataSource.register(JsonLinesSink)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    for _ in range(LIMIT // BATCH):
        q = (
            spark.readStream.format("tickstream")
            .option("batch", BATCH)
            .option("limit", LIMIT)
            .load()
            .writeStream.format("jsonlines_sink")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    manifests = read_stream_manifests(out)
    assert [m["batch_id"] for m in manifests] == sorted(
        m["batch_id"] for m in manifests
    )
    rows = []
    for m in manifests:
        for part in m["parts"]:
            with open(os.path.join(out, part)) as f:
                rows.extend(json.loads(line) for line in f)
    assert sorted((r["i"], r["payload"]) for r in rows) == [
        (i, f"tick-{i:05d}") for i in range(LIMIT)
    ]
    assert sum(m["total_rows"] for m in manifests) == LIMIT


def test_tick_reader_never_regresses_committed_offset():
    """If a restart lowers the configured limit below an
    already-committed cursor, the reader must emit nothing and HOLD
    the offset — committing a lower offset would re-deliver rows
    after a later limit raise (code-review r6 finding)."""
    from map_reduce_library_spark.sources.pystream import (
        _TickStreamReader,
    )

    r = _TickStreamReader(batch=10, limit=30)
    rows, offset = r.read({"i": 50})
    assert list(rows) == []
    assert offset == {"i": 50}
