"""Approximate/sketch queries (SURVEY.md §2D: sketches ABSENT in the
reference → extension). HLL and KLL sketch internals differ between
engines, so these register WITHOUT oracles (driver records rows-only);
tests/test_approx.py bounds them against exact answers instead."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


@register("approx_distinct_users")  # rows-only: HLL differs across engines
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct user estimate per event type — the
    constant-memory alternative to COUNT(DISTINCT)'s two-phase
    shuffle; at 100 TB this is the only viable per-key cardinality."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("approx_quantiles_price")  # rows-only: KLL-ish sketch differs
def approx_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of order totals per priority via
    percentile_approx (single-pass mergeable sketch)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
    )
