"""Batch event-log analytics: funnel conversion, cohort retention,
and EWMA smoothing over the ``events`` table — the product-analytics
workloads every event warehouse runs next to the streaming versions
(`querydefs/streaming.py` covers the continuous forms of windowing;
these are the historical-scan forms).

All three are pure DataFrame compositions (joins/windows/aggregates,
no Python in the row path) and shuffle only on ``user_id`` or the
small post-aggregation relations, so they ride a user-bucketed event
log at 100 TB with at most one exchange over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

FUNNEL_STAGES = ("view", "click", "purchase")
EWMA_ALPHA = 0.3


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT 1 AS stage_idx, 'view' AS stage,
             CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL
      SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
      UNION ALL
      SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    )
    SELECT stage_idx, stage, n_users,
           round(n_users / CAST(first_value(n_users)
                 OVER (ORDER BY stage_idx) AS DOUBLE), 9) AS pct_of_entry
    FROM counts
    """,
)
def funnel_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered funnel: users whose first view precedes a later click
    precedes a later purchase. Each stage is a groupBy(user) min-ts
    over the stage's events joined to the previous stage's anchor —
    stage relations shrink monotonically and every join key is
    user_id, so the whole funnel is co-partitioned after one shuffle
    of the (type-filtered, column-pruned) log. The 3-row result is
    assembled from three scalar counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[1])
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[2])
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = None
    for idx, (name, rel) in enumerate(
        zip(FUNNEL_STAGES, (s1, s2, s3)), start=1
    ):
        row = rel.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("stage_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            # try_divide: an empty entry stage yields NULL pct rows
            # (DuckDB's x/0.0 is NULL too) instead of an ANSI
            # DIVIDE_BY_ZERO crash on a log with no entry events
            F.try_divide(
                F.col("n_users"), F.first("n_users").over(w).cast("double")
            ),
            9,
        ).alias("pct_of_entry"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    cohort_sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_week
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events
    ),
    joined AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.active_week) / 7
                  AS BIGINT) AS week_offset,
             CAST(count(*) AS BIGINT) AS n_active
      FROM activity a JOIN firsts f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT j.cohort_week, j.week_offset, j.n_active,
           round(j.n_active / CAST(c.cohort_size AS DOUBLE), 9)
             AS retention
    FROM joined j JOIN cohort_sizes c ON j.cohort_week = c.cohort_week
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    tracked by distinct-active weeks at each offset. Two aggregates
    over the log (first-seen per user; distinct user-week activity)
    share the user_id shuffle; the cohort-size join is a broadcast of
    the tiny per-week relation."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    cohort_sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    joined = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return joined.join(F.broadcast(cohort_sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active") / F.col("cohort_size").cast("double"), 9
        ).alias("retention"),
    )


@register(
    "ewma_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             round(sum(value), 6) AS day_rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    indexed AS (
      SELECT day, day_rev,
             row_number() OVER (ORDER BY day) - 1 AS i
      FROM daily
    ),
    scaled AS (
      SELECT day, day_rev, i,
             sum(day_rev * power(1.0 / (1 - {EWMA_ALPHA}), i))
               OVER (ORDER BY i) AS num_scaled,
             sum(power(1.0 / (1 - {EWMA_ALPHA}), i))
               OVER (ORDER BY i) AS den_scaled
      FROM indexed
    )
    SELECT day, day_rev,
           round(power(1 - {EWMA_ALPHA}, i) * num_scaled
                 / (power(1 - {EWMA_ALPHA}, i) * den_scaled), 6) AS ewma
    FROM scaled
    """,
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily purchase
    revenue (pandas ``adjust=True`` form: weights (1-a)^(d-k)
    normalized over the observed prefix).

    The recursion is re-expressed as two RUNNING SUMS of rescaled
    terms — x_k/(1-a)^k — so the whole smoothing is one ordered
    window over the tiny daily aggregate instead of a sequential
    loop: num_d = (1-a)^d * Σ x_k (1-a)^-k. The rescaling grows as
    (1-a)^-k, so this closed form is for bounded windows (a 30-day
    report here; ~700 days before the scale factor hits 1e108 at
    a=0.3) — longer histories should chunk by epoch and chain the
    carry, or run the same recurrence in applyInPandas per series.
    Daily revenue is rounded BEFORE smoothing so both engines smooth
    byte-identical inputs."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("day_rev"))
    )
    wi = Window.orderBy("day")
    indexed = daily.withColumn(
        "i", (F.row_number().over(wi) - F.lit(1)).cast("bigint")
    )
    inv = 1.0 / (1.0 - EWMA_ALPHA)
    wrun = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scaled = indexed.select(
        "day",
        "day_rev",
        "i",
        F.sum(F.col("day_rev") * F.pow(F.lit(inv), F.col("i")))
        .over(wrun)
        .alias("num_scaled"),
        F.sum(F.pow(F.lit(inv), F.col("i"))).over(wrun).alias("den_scaled"),
    )
    decay = F.pow(F.lit(1.0 - EWMA_ALPHA), F.col("i"))
    return scaled.select(
        "day",
        "day_rev",
        F.round(
            (decay * F.col("num_scaled")) / (decay * F.col("den_scaled")), 6
        ).alias("ewma"),
    )


Z_THRESHOLD = 1.5


@register(
    "daily_event_anomalies",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, avg(n_events) AS mu,
             stddev_samp(n_events) AS sd
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.n_events,
           round((d.n_events - s.mu) / s.sd, 6) AS z
    FROM daily d JOIN stats s USING (event_type)
    WHERE abs(round((d.n_events - s.mu) / s.sd, 6)) >= {Z_THRESHOLD}
    """,
)
def daily_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: days whose event count sits >=
    Z_THRESHOLD (1.5) sample standard deviations from that event type's
    mean. One shuffle builds the daily series; the per-type moment
    relation (|event types| rows) broadcasts back onto it. z is
    rounded to 6 dp BEFORE thresholding so the cut is reproducible
    across engines' streaming-variance implementations (ulp-level
    divergence cannot flip membership)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n_events").alias("mu"),
        F.stddev_samp("n_events").alias("sd"),
    )
    # try_divide: a constant daily series has sd = 0.0; DuckDB's
    # x/0.0 is NULL (fails the threshold filter), Spark ANSI would
    # crash — try_divide gives the NULL the oracle computes
    z = F.round(
        F.try_divide(F.col("n_events") - F.col("mu"), F.col("sd")), 6
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .where(F.abs(F.col("z")) >= Z_THRESHOLD)
        .select("event_type", "day", "n_events", "z")
    )
