"""Temporal join queries: as-of and range joins, oracle-checked
against DuckDB's native ASOF JOIN / inequality joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.temporal import asof_join, range_join
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

RANGE_TOLERANCE_S = 1800  # 30 minutes


@register(
    "asof_last_purchase_before_error",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         pur AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT err.event_id, err.user_id, err.ts,
           pur.event_id AS purchase_event_id,
           pur.value AS purchase_value
    FROM err ASOF LEFT JOIN pur
      ON err.user_id = pur.user_id AND err.ts >= pur.ts
    """,
)
def asof_last_purchase_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (composed: union + window last-non-null, one shuffle
    on user_id): each error event gets the user's latest purchase
    at-or-before it, NULL if none. Matches DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id_src"),
        "user_id",
        "ts",
        F.col("value").alias("purchase_value_src"),
    )
    out = asof_join(
        err,
        pur,
        ts="ts",
        by="user_id",
        right_cols=["purchase_event_id_src", "purchase_value_src"],
        suffix="",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("purchase_event_id_src").alias("purchase_event_id"),
        F.col("purchase_value_src").alias("purchase_value"),
    )


@register(
    "range_join_purchase_after_error",
    oracle=f"""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         pur AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT pur.event_id AS p_event_id, err.event_id AS e_event_id,
           pur.user_id AS user_id,
           CAST(epoch_us(pur.ts) - epoch_us(err.ts) AS BIGINT) AS delay_us
    FROM pur JOIN err
      ON pur.user_id = err.user_id
     AND pur.ts >= err.ts
     AND epoch_us(pur.ts) - epoch_us(err.ts) <= {RANGE_TOLERANCE_S} * 1000000
    """,
)
def range_join_purchase_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via time-bucketing: purchases within 30
    minutes after an error by the same user. The bucketed equi-join
    bounds fan-out at scale; oracle is the plain inequality join."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = range_join(
        pur, err, ts="ts", by="user_id", tolerance_seconds=RANGE_TOLERANCE_S,
        left_alias="p", right_alias="e",
    )
    return out.select(
        F.col("p_event_id"),
        F.col("e_event_id"),
        F.col("p_user_id").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("e_ts")).alias("delay_us"),
    )


@register(
    "scd2_user_state_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rns
      FROM events
    ),
    islands AS (
      SELECT user_id, event_type AS state,
             min(ts) AS valid_from,
             min(event_id) AS first_event_id,
             CAST(count(*) AS BIGINT) AS n_events
      FROM ordered GROUP BY user_id, event_type, rn - rns
    ),
    hist AS (
      SELECT user_id, state, valid_from, first_event_id, n_events,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, first_event_id)
               AS valid_to
      FROM islands
    )
    SELECT user_id, state, valid_from, valid_to, first_event_id,
           n_events, (valid_to IS NULL) AS is_current
    FROM hist
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history built from an event
    log: consecutive same-state runs per user collapse into validity
    intervals [valid_from, valid_to) with an is_current flag on the
    open interval — the gaps-and-islands pattern (run id = difference
    of two row_numbers) every warehouse dimension build uses.

    Plan shape: both row_numbers and the final lead() share the ONE
    shuffle on user_id (sub-partitioning by (user_id, event_type)
    and the island groupBy are prefix-compatible with it), so the
    whole history build is a single exchange over the log — at 100 TB
    the log is already bucketed by user/entity id and even that
    exchange disappears."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_state = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    islands = (
        ev.withColumn(
            "grp",
            F.row_number().over(w_user) - F.row_number().over(w_state),
        )
        .groupBy("user_id", F.col("event_type").alias("state"), "grp")
        .agg(
            F.min("ts").alias("valid_from"),
            F.min("event_id").alias("first_event_id"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w_hist = Window.partitionBy("user_id").orderBy(
        "valid_from", "first_event_id"
    )
    return islands.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_hist).alias("valid_to"),
        "first_event_id",
        "n_events",
        F.lead("valid_from").over(w_hist).isNull().alias("is_current"),
    )
