"""Skew-handling query corpus: the explicit salting operators
(operators/skew.py) exercised end-to-end against plain-SQL oracles —
the salted plans must be bit-equal to their unsalted equivalents,
which is exactly what the oracle comparison proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.skew import salted_join, two_phase_agg
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


@register(
    "skew_two_phase_agg",
    oracle="""
    SELECT l_suppkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
             AS sum_l_extendedprice,
           count(*) AS cnt
    FROM lineitem GROUP BY l_suppkey
    """,
)
def skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) SUM per supplier: phase 1 aggregates on
    (key, salt) so a hot key spreads over `salt` reducers, phase 2
    merges partials. Decimal accumulation makes the result bit-equal
    to the direct sum, so the oracle is the PLAIN group-by — the
    strongest possible check that salting changed the schedule, not
    the answer (operators/skew.py:45)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    return two_phase_agg(li, "l_suppkey", "l_extendedprice", salt=8)


@register(
    "skew_salted_join",
    oracle="""
    SELECT l.l_suppkey AS suppkey, s.s_name,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY l.l_suppkey, s.s_name
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join (lineitem x supplier) aggregated per
    supplier. The left side's salt comes from a content hash (never a
    nondeterministic id — stage retries must re-salt identically), the
    small right side is replicated `salt` times, and the oracle is the
    UNSALTED join: equality proves semantic transparency
    (operators/skew.py:19)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        "l_extendedprice",
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    joined = salted_join(li, sup, "suppkey", salt=8)
    return joined.groupBy("suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,2)"))
        .cast("double")
        .alias("revenue"),
    )
