"""Relational corpus, part 8: disjunctive-predicate join (Q19 shape),
double-correlated EXISTS/NOT EXISTS (Q21 shape), anti join + exact
uncorrelated scalar-average comparison (Q22 shape), ntile/percent_rank/
cume_dist windows, and map-typed column functions.

Reference capability anchor: the reference framework's shuffle is a
group-by-key over arbitrary user pairs (/root/reference/
MapReduceFramework.cpp:213-268); these queries are part of the
declarative extension corpus built on top of that envelope (SURVEY.md
section 2D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.relational import dec
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 35
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive clauses spanning both join
    sides. The join key is still a plain equi-join (Catalyst keeps the
    disjunction as a post-join filter / partial pushdown); part is
    broadcast so the disjunction never forces a shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    brand = F.col("p_brand")
    clause = (
        ((brand == "Brand#12") & sz.between(1, 15) & q.between(1, 30))
        | ((brand == "Brand#23") & sz.between(5, 25) & q.between(10, 40))
        | ((brand == "Brand#3") & sz.between(10, 35) & q.between(20, 50))
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return j.where(clause).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "latest_shipper_per_order",
    oracle="""
    WITH win AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS sup_max
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    waiters AS (
      SELECT w1.l_suppkey FROM win w1
      WHERE EXISTS (SELECT 1 FROM win w2
                    WHERE w2.l_orderkey = w1.l_orderkey
                      AND w2.l_suppkey <> w1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM win w3
                        WHERE w3.l_orderkey = w1.l_orderkey
                          AND w3.l_suppkey <> w1.l_suppkey
                          AND w3.sup_max >= w1.sup_max)
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM waiters JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def latest_shipper_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema: no commitdate, so "kept
    the order waiting" = strictly last supplier to ship in a
    multi-supplier order; ties disqualify).

    The oracle keeps the classic EXISTS + NOT EXISTS double
    correlation; Spark-first we decorrelate to ONE shuffle: per-
    (order, supplier) max, then window functions over l_orderkey
    decide "other suppliers exist" (n_sup) and "strictly latest"
    (unique max). Same partitioning serves both window passes."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("sup_max")
    )
    w = Window.partitionBy("l_orderkey")
    scored = per.select(
        "l_suppkey",
        F.count(F.lit(1)).over(w).alias("n_sup"),
        F.max("sup_max").over(w).alias("order_max"),
        F.sum(
            F.when(
                F.col("sup_max")
                == F.max("sup_max").over(w),
                1,
            ).otherwise(0)
        ).over(w).alias("n_at_max"),
        "sup_max",
    )
    winners = scored.where(
        (F.col("n_sup") > 1)
        & (F.col("sup_max") == F.col("order_max"))
        & (F.col("n_at_max") == 1)
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        winners.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "global_sales_opportunity",
    oracle="""
    WITH sel AS (
      SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE right(c_name, 2) IN
        ('05','11','17','23','29','31','44','58','67','90')
    ),
    tot AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM sel WHERE c_acctbal > 0
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM sel, tot
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY cntrycode
    """,
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: country-code grouping (substring), an
    UNCORRELATED scalar subquery ("above average balance"), and a
    NOT EXISTS anti join (customers with no recent orders).

    The average comparison is done by exact cross-multiplication
    (bal * n > sum) entirely in decimals, so both engines make
    bit-identical above/below decisions — no float-average boundary
    flakiness. The 1-row aggregate is crossJoin-broadcast."""
    codes = ["05", "11", "17", "23", "29", "31", "44", "58", "67", "90"]
    c = _t(spark, sf_dir, "customer")
    cntry = F.substring(F.col("c_name"), -2, 2)
    sel = c.where(cntry.isin(codes)).select(
        cntry.alias("cntrycode"), "c_acctbal", "c_custkey"
    )
    tot = sel.where(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        sel.crossJoin(F.broadcast(tot))
        .where(dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "ntile_window_stats",
    oracle="""
    SELECT c_mktsegment, q, COUNT(*) AS n_cust,
           MAX(pr) AS max_pr, MAX(cd) AS max_cd,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM (
      SELECT c_mktsegment, c_acctbal,
             NTILE(4) OVER w AS q,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey)
    )
    GROUP BY c_mktsegment, q
    """,
)
def ntile_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles, percent_rank, cume_dist.
    Ordering key (c_acctbal, c_custkey) is unique, so every rank —
    and therefore every k/(n-1) ratio — is deterministic and
    bit-identical across engines (small-integer IEEE divisions).
    MAX over the doubles is order-independent."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("q"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("c_mktsegment", "q").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.max("pr").alias("max_pr"),
        F.max("cd").alias("max_cd"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "map_column_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           UPPER(p_type) AS type_u,
           p_size AS size_i,
           3 AS n_entries,
           'brand,size,type' AS keys_sorted
    FROM part
    """,
)
def map_column_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: str_to_map parse, transform_values lambda,
    element_at lookup, map_keys, size. The oracle computes the same
    scalars straight from the source columns — the Spark side must
    round-trip them through a real MapType to match."""
    p = _t(spark, sf_dir, "part")
    raw = F.concat_ws(
        ",",
        F.concat(F.lit("brand:"), F.col("p_brand")),
        F.concat(F.lit("type:"), F.col("p_type")),
        F.concat(F.lit("size:"), F.col("p_size").cast("string")),
    )
    m = F.str_to_map(raw, F.lit(","), F.lit(":"))
    upper = F.transform_values(m, lambda _, v: F.upper(v))
    return p.select(
        "p_partkey",
        F.element_at(upper, "brand").alias("brand_u"),
        F.element_at(upper, "type").alias("type_u"),
        F.element_at(m, "size").cast("int").alias("size_i"),
        F.size(m).alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )
