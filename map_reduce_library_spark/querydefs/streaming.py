"""Streaming + sessionization queries.

``streaming_hourly_window`` runs a REAL Structured Streaming query
(availableNow over the events file) and is oracle-checked against the
batch SQL equivalent — the strongest streaming correctness check
available: the bounded stream must converge to the batch answer.

``sessionize_events`` is the batch sessionization (30-min inactivity
gap) via window functions, fully oracle-checked. The stateful
streaming twin lives in streaming/events.py and is covered by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.streaming.events import streaming_hourly_stats
from map_reduce_library_spark.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "streaming_hourly_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregate; bounded run
    must equal the batch answer."""
    return streaming_hourly_stats(spark, sf_dir)


@register(
    "streaming_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, value FROM events
      UNION ALL
      SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP)
               AS window_start,
             event_type, value FROM events
    )
    SELECT window_start,
           CAST(window_start + INTERVAL 2 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM assigned
    GROUP BY 1, 2, 3
    """,
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (width 2h, slide 1h) as a REAL streaming query:
    every event lands in two overlapping windows. Oracle = union of
    two shifted tumbling assignments — the algebraic identity sliding
    windows reduce to."""
    from map_reduce_library_spark.streaming.events import read_events_stream
    import uuid

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
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
    from map_reduce_library_spark.streaming.events import (
        drain_shuffle_partitions,
        run_to_memory,
    )

    return run_to_memory(
        agg,
        "sliding",
        "complete",
        shuffle_partitions=drain_shuffle_partitions(spark, sf_dir),
    )


@register(
    "streaming_dedup_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT event_id) AS n_ids
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state: the event stream is doubled
    (self-union) then deduplicated by dropDuplicatesWithinWatermark;
    per-type counts of the survivors must equal the original table —
    i.e. the stream dedup removed exactly the injected duplicates."""
    from map_reduce_library_spark.streaming.events import streaming_dedup

    return streaming_dedup(spark, sf_dir).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@register(
    "stream_static_join_counts",
    oracle="""
    SELECT c_mktsegment, e.event_type, COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment, e.event_type
    """,
)
def stream_static_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (customer), then aggregated — the standard streaming
    enrichment topology. The static side needs no watermark and is
    broadcast into every micro-batch, so the join adds no shuffle and
    no state; only the downstream groupBy keeps state."""
    import uuid

    from map_reduce_library_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(dim), stream.user_id == dim.c_custkey
    )
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    from map_reduce_library_spark.streaming.events import (
        drain_shuffle_partitions,
        run_to_memory,
    )

    return run_to_memory(
        agg,
        "streamstatic",
        "complete",
        shuffle_partitions=drain_shuffle_partitions(spark, sf_dir),
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by 30-min inactivity gap: lag + running sum of
    boundary flags, then per-session aggregates. Shuffles once on
    user_id; the window sort and the groupBy reuse that partitioning."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US, 1
        ).otherwise(0),
    )
    s = g.withColumn("session_id", F.sum("new_session").over(w))
    return (
        s.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS session_id
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE dynamic session windows (``F.session_window``)
    in batch mode: one groupBy does the gap-merge and the aggregate —
    no window-function pass, no island bookkeeping.  Boundary
    semantics (EMPIRICALLY pinned on Spark 4.1.2, code-review r6): an
    event exactly ``gap`` after its predecessor MERGES into the same
    session — Spark merges touching per-event windows, not just
    overlapping ones — so the lag-based oracle splits strictly on
    ``>`` (same tick as ``sessionize_events``; the old ``>=`` claimed
    exclusive-end splitting Spark does not do, a latent red waiting
    for two events exactly 30 min apart).  session_end = last event +
    gap."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("sw"),
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


@register(
    "streaming_session_window",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS session_id
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows computed BY THE STREAMING ENGINE (state-store
    merged across micro-batches, availableNow-bounded) — same oracle as
    the batch ``session_window_native``; parity proves the stateful
    merge is exact."""
    from map_reduce_library_spark.streaming.events import (
        streaming_session_windows,
    )

    return streaming_session_windows(spark, sf_dir)


@register(
    "foreach_batch_event_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def foreach_batch_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch end-to-end, driver-checked: the event stream is
    delivered micro-batch-by-micro-batch through a foreachBatch
    parquet writer (the escape-hatch sink for targets Structured
    Streaming lacks natively; checkpointed, exactly-once per batch
    id), then the landed files are read back and aggregated — the
    totals must equal the batch answer, proving no batch was lost,
    duplicated, or partially written. The landed aggregate is
    materialized (localCheckpoint) so the scratch dir — a full copy
    of the events table plus checkpoint state — can be REMOVED before
    returning; repeated driver/bench invocations previously grew /tmp
    without bound (code-review r6)."""
    import shutil
    import tempfile

    from map_reduce_library_spark.streaming.events import (
        stream_events_to_parquet,
    )

    base = tempfile.mkdtemp(prefix="mrls_febc_")
    try:
        stream_events_to_parquet(
            spark, sf_dir, f"{base}/out", f"{base}/ckpt"
        )
        return (
            spark.read.parquet(f"{base}/out")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("value_sum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
