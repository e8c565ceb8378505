"""Stream-stream join with watermarks: purchases joined to errors by
the same user within 30 minutes BEFORE the purchase — both sides are
real streams; watermarks bound each side's join state. A bounded
(availableNow) run must equal the batch range join."""

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from map_reduce_library_spark.streaming.events import read_events_stream
from map_reduce_library_spark.tables import load_table


def test_stream_stream_interval_join_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)

    pur = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    err = (
        stream.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = pur.join(
        err,
        F.expr(
            """
            p_user = e_user AND
            e_ts <= p_ts AND
            e_ts >= p_ts - INTERVAL 30 MINUTES
            """
        ),
    ).select("p_id", "e_id")

    import uuid

    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.p_id, r.e_id) for r in spark.table(sink).collect()}

    ev = load_table(spark, SF_SMOKE, "events")
    purb = ev.where("event_type = 'purchase'").selectExpr(
        "event_id AS p_id", "user_id AS p_user", "ts AS p_ts"
    )
    errb = ev.where("event_type = 'error'").selectExpr(
        "event_id AS e_id", "user_id AS e_user", "ts AS e_ts"
    )
    want = {
        (r.p_id, r.e_id)
        for r in purb.join(
            errb,
            F.expr(
                "p_user = e_user AND e_ts <= p_ts "
                "AND e_ts >= p_ts - INTERVAL 30 MINUTES"
            ),
        )
        .select("p_id", "e_id")
        .collect()
    }
    assert want, "batch join should find matches"
    assert got == want


def test_stream_stream_left_outer_join_invariants(spark):
    """LEFT OUTER stream-stream join with state eviction. The exact
    set of emitted NULL rows depends on the watermark at the LAST
    data micro-batch (outer rows for purchases newer than that
    frontier stay in state when availableNow terminates — verified
    empirically: the frontier is the penultimate batch's max ts minus
    the delay, NOT the global max), so the pinned contract is the
    batch-semantics envelope rather than an exact row set:
      * non-null rows == the batch inner join, exactly (matches are
        emitted on arrival, never dropped, never duplicated);
      * every NULL row is a genuinely unmatched purchase under batch
        left-join semantics (no false NULLs);
      * NULL rows are unique per purchase;
      * the vast majority of unmatched purchases ARE finalized (the
        frontier holds back only the trailing watermark margin)."""
    import uuid

    from pyspark.sql import functions as F

    from map_reduce_library_spark.streaming.events import read_events_stream
    from map_reduce_library_spark.tables import load_table

    stream = read_events_stream(spark, SF_SMOKE)
    pur = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    err = (
        stream.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "10 minutes")
    )
    joined = pur.join(
        err,
        F.expr(
            "p_user = e_user AND e_ts <= p_ts "
            "AND e_ts >= p_ts - INTERVAL 30 MINUTES"
        ),
        "left_outer",
    ).select("p_id", "e_id")

    sink = f"ssjlo_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(sink).collect()

    ev = load_table(spark, SF_SMOKE, "events")
    purb = ev.where("event_type = 'purchase'").selectExpr(
        "event_id p_id", "user_id p_user", "ts p_ts"
    )
    errb = ev.where("event_type = 'error'").selectExpr(
        "event_id e_id", "user_id e_user", "ts e_ts"
    )
    batch_inner = {
        (r.p_id, r.e_id)
        for r in purb.join(
            errb,
            F.expr(
                "p_user = e_user AND e_ts <= p_ts "
                "AND e_ts >= p_ts - INTERVAL 30 MINUTES"
            ),
        ).collect()
    }
    matched_purchases = {p for p, _ in batch_inner}
    all_purchases = {r.p_id for r in purb.collect()}

    stream_matched = [(r.p_id, r.e_id) for r in rows if r.e_id is not None]
    stream_nulls = [r.p_id for r in rows if r.e_id is None]

    assert set(stream_matched) == batch_inner
    assert len(stream_matched) == len(batch_inner)  # no duplicates
    # no false NULLs: every NULL row is batch-unmatched
    unmatched = all_purchases - matched_purchases
    assert set(stream_nulls) <= unmatched
    assert len(stream_nulls) == len(set(stream_nulls))
    # the frontier holds back only a small trailing margin
    assert len(stream_nulls) >= 0.9 * len(unmatched)
