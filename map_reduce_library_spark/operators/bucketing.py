"""Bucketed (pre-partitioned) tables for shuffle-free joins.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle of both
sides. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
sorted within buckets, so every later join (and groupBy on the key)
runs bucket-to-bucket with zero exchange — the Spark equivalent of
co-located storage layouts.

This module owns the write-side convention (bucket count, sort) and a
checker that proves a join plan is exchange-free on the bucketed
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
) -> None:
    """Persist ``df`` hash-bucketed + sorted on ``key``. Bucket count
    is a layout contract: join partners must use the SAME count (or an
    integer multiple) for the exchange-free plan to kick in."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count SHUFFLE exchanges of any partitioning (hash, range,
    round-robin, single-partition) in the physical plan.
    BroadcastExchange is deliberately excluded — it ships a small
    build side, not a shuffle. (The old literal
    'Exchange hashpartitioning' count let a rangepartitioning sort
    shuffle 'prove' a plan exchange-free; code-review r6.)

    Note: before the query has executed, AQE plans print their
    INITIAL shape (isFinalPlan=false) — runtime re-optimization can
    only remove exchanges, so the pre-execution count is an upper
    bound. AFTER execution the toString additionally appends an
    '== Initial Plan ==' section — counting it would double every
    exchange exactly when auditing is most natural (post-action), so
    only the text before that marker is counted (code-review r8,
    verified: 1 pre-collect, 2 post-collect without the cut)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"(?<![A-Za-z])Exchange ", plan))
