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


@register("hll_sketch_rollup_daily")  # rows-only: sketch bytes are engine-specific
def hll_sketch_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch hypertable rollup: hourly Datasketches-HLL
    sketches of distinct users, merged (NOT recomputed) into daily
    estimates via hll_union_agg. This is the scale path the exact
    variant (``hypertable_rollup_daily``, set-union of values) cannot
    take at 100 TB: sketch state is ~KB per bucket regardless of
    cardinality, and merging is associative — the defining property a
    continuous-aggregate / multi-resolution store needs.

    tests/test_approx.py bounds the estimates against exact distinct
    counts."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    return (
        hourly.groupBy("day")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch", F.lit(False))
            ).alias("approx_users"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .select(F.col("day").cast("timestamp").alias("day"), "approx_users", "n_hours")
    )


# ---- exact companions --------------------------------------------------
# One hash-oracled twin per sketch family over the SAME grouping keys,
# so each sketch's pytest tolerance band is anchored by a green driver
# row (the sketch itself can only be rows-only checked: HLL/KLL
# internals differ between engines).


@register(
    "approx_distinct_users_exact",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact companion of ``approx_distinct_users``: the two-phase
    COUNT(DISTINCT) over the same keys. tests/test_approx.py bounds the
    HLL estimate against this; at 100 TB the sketch is the one that
    survives."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_quantiles_price_exact",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 9) AS p50,
           round(CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE), 9) AS p95,
           round(CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE), 9) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_quantiles_price_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact companion of ``approx_quantiles_price``: holistic
    percentile() (linear interpolation, identical to DuckDB
    quantile_cont) over the same keys and quantiles."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 9).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 9).alias("p95"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 9).alias("p99"),
    )


@register(
    "hll_sketch_rollup_daily_exact",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours
    FROM events GROUP BY 1
    """,
)
def hll_sketch_rollup_daily_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact companion of ``hll_sketch_rollup_daily``: per-day exact
    distinct users + distinct hours over the same day buckets. Unlike
    the sketch rollup it cannot reuse hourly state (distinct does not
    merge), which is precisely why the sketch variant is the 100-TB
    path."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count_distinct(F.date_trunc("hour", "ts")).alias("n_hours"),
    )


@register(
    "heavy_hitter_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM tok)
    SELECT token, COUNT(*) AS cnt
    FROM tok, tot
    GROUP BY token, n
    HAVING COUNT(*) * 50 > n
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (support > 1/50 of all tokens) via the
    two-level count/threshold plan — the ground truth that the
    sketch-based ``freq_items`` path (test-checked superset guarantee)
    approximates at scale with constant memory."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split("text", " ", -1)).alias("token")
    )
    # Materialize the vocabulary counts ONCE: the grand total and the
    # threshold filter are two plan branches over the same relation,
    # and without the checkpoint the full tokenize+aggregate pass ran
    # twice per query (code-review r6). The checkpointed relation is
    # |vocab| rows — tiny next to the corpus scan it saves.
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * 50 > F.col("n"))
        .select("token", "cnt")
    )
