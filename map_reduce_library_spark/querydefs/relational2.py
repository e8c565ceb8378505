"""Relational corpus, part 2: JSON extraction, pivot, cube,
correlated subqueries, regex/LIKE, date arithmetic, array functions,
null handling. Same oracle discipline as relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.relational import dec, dsum
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- JSON
@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) >= 50
                THEN 'high' ELSE 'low' END AS k_bucket
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (events.props) — pure
    JVM-side get_json_object, no Python."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.where(F.get_json_object("props", "$.k").isNotNull())
        .select(
            "event_id",
            k.alias("k_val"),
            F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
        )
    )


# ---------------------------------------------------------------- pivot
@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status column-per-value. Explicit value
    list keeps the plan single-pass (no distinct-collect job)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .na.fill(0, ["F", "O", "P"])
    )


# ---------------------------------------------------------------- cube
@register(
    "cube_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "qty"))
    )


# ------------------------------------------------- correlated subquery
@register(
    "above_avg_orders",
    oracle="""
    WITH a AS (
      SELECT o_custkey AS ck,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot,
             COUNT(o_totalprice) AS n
      FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o JOIN a ON o.o_custkey = a.ck
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * a.n > 2 * a.tot
    """,
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders > 2x their customer's
    average), decorrelated into a join on the aggregated side — the
    plan Catalyst produces for the SQL form too. The threshold
    CROSS-MULTIPLIES exact decimals (price·n > 2·total) instead of
    comparing against a float avg: a float aggregate's partial-merge
    order differs between engines by ulps, and an order landing
    inside that window flips in or out of the result (code-review r6;
    the same discipline as correlated_above_customer_avg and the Q11
    scalar comparison)."""
    o = _t(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    agg_per_cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(price_dec).alias("tot"),
        F.count("o_totalprice").alias("n"),
    )
    return (
        o.join(agg_per_cust, o.o_custkey == agg_per_cust.ck)
        .where(price_dec * F.col("n") > 2 * F.col("tot"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------- regex/LIKE
@register(
    "regex_like_filters",
    oracle="""
    SELECT p_partkey, p_name, p_type,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS consonant_name,
           CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS BIGINT)
             AS name_words
    FROM part
    WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[a-m]')
    """,
)
def regex_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regex predicates and regexp_replace projection."""
    p = _t(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_type").like("%BRASS%") | F.col("p_name").rlike("^[a-m]")
        )
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.regexp_replace("p_name", "[aeiou]", "_").alias("consonant_name"),
            (
                F.length("p_name")
                - F.length(F.regexp_replace(F.col("p_name"), " ", ""))
                + 1
            )
            .cast("bigint")
            .alias("name_words"),
        )
    )


# ---------------------------------------------------------------- date arithmetic
@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
             AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS due_date,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
           CAST(extract(dow FROM o_orderdate) AS INT) AS dow_sunday0
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic + calendar extraction. DuckDB dow is
    0=Sunday; Spark dayofweek is 1=Sunday — aligned by subtracting 1."""
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("due_date"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sunday0"),
    )


# ---------------------------------------------------------------- arrays
@register(
    "array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           CAST(list_contains(toks, 'data') AS BOOLEAN) AS has_data
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: size, indexing, sort/distinct/slice, contains."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_toks"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3_sorted"),
        F.array_contains(toks, "data").alias("has_data"),
    )


# ---------------------------------------------------------------- null handling
@register(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END
             AS pos_balance,
           CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null
    FROM customer
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif/coalesce/conditional-null."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("seg_masked"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.round("c_acctbal", 2))
        .alias("pos_balance"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )
