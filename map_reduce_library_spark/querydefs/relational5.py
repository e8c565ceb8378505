"""Relational corpus, part 5: three-valued IN/NOT IN semantics,
min-per-group join-back (TPC-H Q2 shape), large-volume customers
(TPC-H Q18 shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "three_valued_in_semantics",
    oracle="""
    SELECT 'not_in_with_nulls' AS probe, count(*) AS n FROM customer
    WHERE c_nationkey NOT IN (SELECT CASE WHEN s_acctbal < 1000 THEN NULL
                                          ELSE s_nationkey END
                              FROM supplier)
    UNION ALL
    SELECT 'in_with_nulls' AS probe, count(*) AS n FROM customer
    WHERE c_nationkey IN (SELECT CASE WHEN s_acctbal < 1000 THEN NULL
                                      ELSE s_nationkey END
                          FROM supplier)
    UNION ALL
    SELECT 'not_in_clean' AS probe, count(*) AS n FROM customer
    WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier
                              WHERE s_acctbal > 5000)
    """,
)
def three_valued_in_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL three-valued logic in FILTER context: NOT IN over a set
    containing NULL keeps zero rows (UNKNOWN is not TRUE); IN keeps
    only definite matches. Spark's null-aware anti join and DuckDB
    agree here. (Discovered divergence, deliberately avoided: a
    PROJECTED `x IN (subquery-with-nulls)` returns FALSE in Spark
    where the standard — and DuckDB — say NULL; filter context is the
    well-defined common ground.)"""
    for name in ("customer", "supplier"):
        _t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_3vl")
    return spark.sql(
        """
        SELECT 'not_in_with_nulls' AS probe, count(*) AS n FROM customer_3vl
        WHERE c_nationkey NOT IN (SELECT CASE WHEN s_acctbal < 1000 THEN NULL
                                              ELSE s_nationkey END
                                  FROM supplier_3vl)
        UNION ALL
        SELECT 'in_with_nulls' AS probe, count(*) AS n FROM customer_3vl
        WHERE c_nationkey IN (SELECT CASE WHEN s_acctbal < 1000 THEN NULL
                                          ELSE s_nationkey END
                              FROM supplier_3vl)
        UNION ALL
        SELECT 'not_in_clean' AS probe, count(*) AS n FROM customer_3vl
        WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier_3vl
                                  WHERE s_acctbal > 5000)
        """
    )


@register(
    "min_cost_per_part",
    oracle="""
    WITH mn AS (
      SELECT l_partkey, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, mn.min_price,
           min(l.l_suppkey) AS best_suppkey
    FROM lineitem l JOIN mn
      ON l.l_partkey = mn.l_partkey AND l.l_extendedprice = mn.min_price
    GROUP BY l.l_partkey, mn.min_price
    """,
)
def min_cost_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group then join back to recover the
    achieving row (deterministic min-suppkey tiebreak). The agg side
    is tiny after grouping → AQE broadcasts the join-back."""
    li = _t(spark, sf_dir, "lineitem")
    mn = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(
            mn,
            (li.l_partkey == mn.pk) & (li.l_extendedprice == mn.min_price),
        )
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )


@register(
    "large_volume_customers",
    oracle="""
    WITH vol AS (
      SELECT o_custkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 1000
    )
    SELECT c_custkey, c_name, total_qty
    FROM vol JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, c_custkey
    LIMIT 10
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: heavy two-fact join + agg + having, join back
    to the dimension, top-k. The fact⋈fact join shuffles on orderkey
    (bucketing both facts on orderkey removes it — see
    operators/bucketing.py); the dimension join broadcasts the
    POST-HAVING aggregate (bounded by >1000-qty customers at any SF)
    — broadcasting the customer table itself grows with SF and was
    the wrong side (code-review r6)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    vol = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .where(F.col("total_qty") > 1000)
    )
    return (
        F.broadcast(vol)
        .join(cust, vol.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("c_custkey"))
        .limit(10)
    )
