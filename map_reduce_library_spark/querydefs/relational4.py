"""Relational corpus, part 4: statistical aggregates, explicit
grouping sets, multi-resolution (hypertable-style) rollups."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "stat_aggregates",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS var,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_uid,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_uid,
           round(skewness(value), 6) AS skew
    FROM events GROUP BY event_type
    """,
)
def stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/var/corr/covar/skewness).
    Merge-order float drift is sub-1e-9 at this scale; rounded to 6
    decimals on both engines."""
    ev = _t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.corr(F.col("value"), uid), 6).alias("corr_uid"),
        F.round(F.covar_samp(F.col("value"), uid), 6).alias("covar_uid"),
        # Spark's skewness is the population form g1; DuckDB reports
        # the bias-corrected sample form G1 = g1 * sqrt(n(n-1))/(n-2).
        # n = count of NON-NULL values (count('value'), matching what
        # skewness itself aggregates over — the row count diverges the
        # moment the column is nullable; code-review r6).
        F.round(
            F.skewness("value")
            * F.sqrt(F.count("value") * (F.count("value") - 1))
            / (F.count("value") - 2),
            6,
        ).alias("skew"),
    )


@register(
    "grouping_sets_explicit",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from rollup/cube): per
    status, per priority, and grand total in one pass."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "hypertable_rollup_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the DAILY rollup is
    computed FROM the hourly rollup (not from raw events) — the
    mergeable-aggregate pattern that makes multi-resolution time-series
    maintenance O(hourly rows). count/sum merge exactly; the only
    non-mergeable agg (distinct users) re-aggregates the hourly
    distinct sets carried as arrays."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum_dec"),
        F.collect_set("user_id").alias("users"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum_dec").cast("double").alias("value_sum"),
            F.size(F.array_distinct(F.flatten(F.collect_list("users")))).cast(
                "bigint"
            ).alias("n_users"),
        )
    )
