"""Structured Streaming over the ``events`` table.

The reference is strictly batch (input fully materialized before the
job starts, MapReduceFramework.h:43-46); streaming is a north-star
extension (SURVEY.md §2D). Design:

- ``read_events_stream``: file-source ``readStream`` with an explicit
  schema (required for streaming reads). The events parquet stores
  TIMESTAMP(NANOS) → read as int64 and convert, same as the batch
  loader.
- ``streaming_hourly_stats``: watermarked tumbling-window aggregate.
  With ``availableNow`` the whole history is processed as a bounded
  stream — the result must equal the equivalent batch/SQL aggregate,
  which is exactly what the DuckDB oracle checks. At 100 TB this same
  topology runs unbounded with kafka sources; the watermark bounds
  state, and the window+key groupBy is the only shuffle.
- ``sessionize_stateful``: custom stateful operator via
  ``applyInPandasWithState`` (per-user event counting with explicit
  GroupState) — the generic "reduce with state across micro-batches"
  capability.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_to_memory(df: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Drain a bounded stream (availableNow) through a uuid-named
    in-memory sink and return the MATERIALIZED result. ONE definition
    of the sink/trigger/await/read-back block that was copy-pasted
    seven times across the streaming family (code-review r6) — and
    the result is eagerly localCheckpoint'ed so the sink's temp view
    can be DROPPED: without the drop, every invocation (driver round,
    bench pass) left a uuid-named view holding its full result on the
    driver heap for the session lifetime."""
    spark = df.sparkSession
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_library_spark.tables import (
        _ensure_nanos_conf,
        normalize_event_ts,
        table_path,
    )

    _ensure_nanos_conf(spark)
    # Streaming file sources require an explicit schema. The testdata
    # generator has shipped events.ts both as TIMESTAMP(NANOS) (read as
    # int64 under nanosAsLong) and as plain TIMESTAMP(MICROS), so probe
    # the actual footer with a batch read (one metadata-only read at
    # stream-construction time) instead of hardcoding either layout.
    batch_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # The file source wants a directory; select just events.parquet
    # out of the sf_dir with a glob filter. ts normalization is the
    # SAME helper the batch loader uses — batch/stream parity by
    # construction.
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw, batch_schema["ts"].dataType)


def streaming_hourly_stats(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums over the event stream,
    processed with availableNow and returned as a finished DataFrame
    (complete output mode → every window present)."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    return run_to_memory(agg, "hourly_stats", "complete")


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each event_id's key in
    state only until the watermark passes it, so state size is
    O(events per watermark horizon), not O(all history) — the only
    dedup that survives an unbounded 100-TB stream.

    To make the dedup observable on duplicate-free testdata, the
    stream is unioned with a second read of itself (every row arrives
    exactly twice); the surviving rows must equal the original table.
    Append mode: first occurrence is emitted immediately, later
    duplicates are dropped against state."""
    s = read_events_stream(spark, sf_dir)  # probe the footer once
    doubled = s.unionAll(s)
    deduped = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return run_to_memory(deduped, "dedup", "append")


def stream_events_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """foreachBatch sink: per-micro-batch batch-DataFrame callback —
    the escape hatch for sinks Structured Streaming lacks natively
    (JDBC upserts, multi-table writes...). Here each micro-batch is
    appended to a parquet directory; the checkpoint makes the whole
    pipeline restartable. foreachBatch delivery is AT-LEAST-ONCE, so
    each batch writes to its own batchId-keyed partition directory
    with overwrite — a retried batch replaces its own partial output
    instead of appending a duplicate copy (the old blind append was
    only at-least-once while the docstring claimed exactly-once;
    code-review r6). Readers of ``out_dir`` see partition column
    ``batch_id`` alongside the event columns."""
    stream = read_events_stream(spark, sf_dir)

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas``
    (Spark 4's arbitrary-stateful-processing API): ValueState holding
    (count, value_sum) per user, updated across micro-batches. The
    successor to ``applyInPandasWithState`` — typed state handles,
    timers, and TTL — exercised here with the same per-key running
    aggregation so both APIs are covered by one batch-equivalence
    check.

    State is O(distinct users); the value sum is accumulated in
    integer micro-units (value × 1e6 rounded) so cross-batch float
    accumulation order cannot change the result.

    Runtime dependency: the transformWithState runner speaks protobuf
    to the JVM state server — environments without ``protobuf``
    installed crash at runner init (the test importorskips on it;
    ``applyInPandasWithState``/``sessionize_stateful`` is the
    dependency-free fallback covering the same capability)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, value_micros bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            st = self._state.get()
            n, micros = (0, 0) if st is None else st
            for pdf in rows:
                n += len(pdf)
                micros += int((pdf["value"] * 1_000_000).round().sum())
            self._state.update((n, micros))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_micros": [micros],
                }
            )

        def close(self) -> None:
            pass

    stream = read_events_stream(spark, sf_dir)
    out = stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, value_micros bigint",
        outputMode="update",
        timeMode="none",
    )
    drained = run_to_memory(out, "tws", "update")
    # Last update per user wins across micro-batches. n_events is
    # monotone per user (each update only appends rows), so max of the
    # (n_events, value_micros) STRUCT selects the true latest update —
    # max-ing the columns independently returned a stale value_micros
    # whenever a later update LOWERED the total (negative values:
    # refunds/adjustments; code-review r6 finding).
    last = F.max(F.struct("n_events", "value_micros")).alias("last")
    return (
        drained
        .groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.col("last.n_events").alias("n_events"),
            F.col("last.value_micros").alias("value_micros"),
        )
    )


def sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running event count via applyInPandasWithState — the
    generic custom-stateful-operator capability (state persists across
    micro-batches; here availableNow bounds the run)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint"
    state_schema = "n bigint"

    def count_events(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = read_events_stream(spark, sf_dir)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # Last update per user wins (a single availableNow pass may split
    # into several micro-batches).
    return (
        run_to_memory(counted, "sessionize", "update")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


def streaming_session_windows(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Native ``session_window`` aggregation in STREAMING mode: the
    state store carries open sessions between micro-batches and merges
    windows as events arrive; gap-expired sessions stop growing.
    Complete output mode + availableNow bounds the run and emits every
    session, so the result equals the batch ``session_window_native``
    query exactly — the strongest possible batch/stream parity check.

    At scale the state is bounded by OPEN sessions only (append mode +
    watermark evicts closed ones); with the RocksDB state store
    provider the per-executor state spills off-heap instead of living
    on the JVM heap.
    """
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            "user_id", F.session_window("ts", gap).alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(agg, "sessions", "complete")
