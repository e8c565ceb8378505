"""Relational corpus, part 3: ordered string aggregation, exact
percentiles, histograms, unpivot/melt."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "listagg_nations_per_region",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect_list is
    unordered by contract, so sort the array before joining — the
    deterministic pattern."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 9) AS p50,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 9) AS p90,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation) — a holistic aggregate
    the reference's reduce contract explicitly permits (SURVEY §2A
    point 2). Spark's percentile() buffers each group; fine for
    bounded group counts, use percentile_approx at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 9).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 9).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) * 50 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_sum
    FROM events
    GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via floor bucketing — one shuffle of
    (n_buckets) partial rows per task regardless of input size."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.floor(F.col("value") / 50) * 50)
            .cast("double")
            .alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("bucket_sum"),
        )
    )


@register(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
    FROM customer
    """,
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide → long without a shuffle (pure projection
    fan-out)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
