"""Relational query corpus over the TPC-H-ish star schema.

Each query is a declarative DataFrame plan (Catalyst handles pushdown,
pruning, join strategy) paired with an ANSI-SQL oracle for DuckDB.
These populate the §2D capability extensions: projection/filter,
equi/broadcast/outer/semi/anti joins, aggregation (incl. rollup,
having, count-distinct), sort/limit/top-k, set ops, window functions,
scalar string/date/math functions.

Scale notes appear per query — the plan shapes are chosen to survive
1000 executors / 100 TB (broadcast constant-size dims, partial aggs,
TakeOrderedAndProject for top-k, no driver-side loops anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.relational import davg, dec, dsum, topk
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- filter/project
@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_quantity > 45
      AND l_returnflag = 'R'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; all three filters and the 6-column
    read schema must reach the parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("disc_price"),
    )


# ---------------------------------------------------------------- TPC-H Q1-ish
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate, tiny group count. One shuffle
    with map-side partial agg; the partial rows per task are ~|groups|
    (≤6), so shuffle traffic is constant regardless of input size —
    the ideal 100-TB aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q3-ish
@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k. customer is the small side (filtered
    on segment) → AQE converts to broadcast; lineitem⋈orders shuffles
    on orderkey. Top-k via TakeOrderedAndProject (no global sort).
    Tiebreak on unique l_orderkey makes the limit deterministic."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )
    return topk(joined, [F.col("revenue").desc(), F.col("l_orderkey")], 10)


# ---------------------------------------------------------------- TPC-H Q5-ish
@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join. region/nation/supplier are constant-or-tiny
    dims at every scale factor → explicit broadcast (zero shuffle for
    those edges); the only big shuffle is lineitem⋈orders⋈customer on
    their keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------- outer join
@register(
    "customer_order_stats_outer",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS order_cnt,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def customer_order_stats_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers; COUNT(col)
    skips nulls so they report 0. Shuffle on custkey only."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


# ---------------------------------------------------------------- semi/anti join
@register(
    "semi_join_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def semi_join_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — EXISTS semantics, no row duplication, and the
    probe side only ships (custkey) after pushdown."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_parts_never_ordered",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                      AND l_shipdate >= TIMESTAMP '2000-06-01')
    """,
)
def anti_join_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — NOT EXISTS; the probe-side filter is pushed
    below the join so only recent lineitems are hashed."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


# ---------------------------------------------------------------- agg: distinct + having
@register(
    "distinct_agg_having",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 50
    """,
)
def distinct_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) (expands to a two-phase partial-distinct plan —
    no single-point bottleneck) + HAVING filter on the aggregate."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") > 50)
    )


# ---------------------------------------------------------------- rollup
@register(
    "rollup_order_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (grouping-sets family)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total"),
        )
    )


# ---------------------------------------------------------------- top-k
@register(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k without a global sort (TakeOrderedAndProject)."""
    return topk(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        25,
    )


# ---------------------------------------------------------------- set ops
@register(
    "set_ops_nations",
    oracle="""
    (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
     INTERSECT
     SELECT s_nationkey AS nationkey FROM supplier)
    UNION
    (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
     EXCEPT
     SELECT s_nationkey AS nationkey FROM supplier)
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct SET semantics —
    ``subtract``, not ``exceptAll().distinct()``: EXCEPT ALL keeps a
    key whenever the left multiplicity exceeds the right's, so
    post-distinct it can emit keys SQL EXCEPT excludes; code-review
    r6)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    rich = cust.where(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    poor = cust.where(F.col("c_acctbal") < 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    return rich.intersect(supp).union(poor.subtract(supp)).distinct()


# ---------------------------------------------------------------- window functions
@register(
    "window_user_running",
    oracle="""
    SELECT event_id, user_id, event_type,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_user_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered window: row_number, running sum, lag. One
    shuffle on user_id; within-partition sort on (ts, event_id) —
    unique event_id makes the frame total-ordered/deterministic."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "window_top2_per_nation",
    oracle="""
    SELECT * FROM (
      SELECT n_name, c_name, c_acctbal,
             RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rnk <= 2
    """,
)
def window_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via RANK — the scale-safe alternative to a
    global sort when N is small; broadcast join to the nation dim."""
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_name", "c_acctbal", "c_custkey")
        .withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 2)
        .drop("c_custkey")
    )


# ---------------------------------------------------------------- scalar functions
@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS pri_upper,
           substr(o_orderpriority, 1, 1) AS pri_code,
           length(o_orderstatus) AS status_len,
           concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(abs(o_totalprice - 100000.0) AS DOUBLE) AS price_dist,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kbucket,
           o_orderkey % 7 AS key_mod
    FROM orders WHERE o_orderkey % 100 < 7
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar-function surface, all JVM-side
    whole-stage-codegen expressions (no Python in the row path)."""
    o = _t(spark, sf_dir, "orders")
    return o.where((F.col("o_orderkey") % 100) < 7).select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_pri"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.abs(F.col("o_totalprice") - 100000.0).cast("double").alias("price_dist"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_kbucket"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


# ---------------------------------------------------------------- conditional agg
@register(
    "conditional_agg_case",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CASE WHEN value > 100 THEN CAST(value AS DECIMAL(18,2))
                         ELSE 0 END) AS DOUBLE) AS big_value_sum,
           CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS big_value_cnt
    FROM events
    GROUP BY event_type
    """,
)
def conditional_agg_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN inside aggregates (pivot-style conditional agg)."""
    ev = _t(spark, sf_dir, "events")
    big = F.when(F.col("value") > 100, dec("value")).otherwise(F.lit(0))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(big).cast("double").alias("big_value_sum"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
        .cast("bigint")
        .alias("big_value_cnt"),
    )
