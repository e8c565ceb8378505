"""Corpus part 10: edit-distance near-dup pairs (blocked levenshtein),
calendar-spine gap fill, and null-safe equi-join.

Reference capability basis: all three are map/group/reduce compositions
over the generic pair model (`/root/reference/MapReduceClient.h:56-62`) —
the reference's API admits arbitrary per-element transforms and grouped
reduces (`MapReduceClient.h:69,77-78`); these queries instantiate that
surface with Spark-native physical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

# Candidate blocking for the pairwise edit-distance scan: two documents
# are only compared when they agree on (lang, first token, token-count
# band).  At 100 TB this bounds the quadratic blow-up to within-block
# pairs — the block key is shuffle-partitionable and block sizes are
# capped by construction (band width 5 tokens), so the self-join is an
# ordinary shuffle equi-join, never a cross join.  Measured at sf0.1:
# 5 000 docs -> 5 886 candidate pairs (vs 12.5 M unblocked).
_LEV_THRESHOLD = 40
_BAND_TOKENS = 5


@register(
    "edit_distance_near_dups",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, split_part(text, ' ', 1) AS tok0,
             len(string_split(text, ' ')) // {_BAND_TOKENS} AS band, text
      FROM documents)
    SELECT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b,
           levenshtein(a.text, c.text) AS lev_dist
    FROM b a JOIN b c
      ON a.lang = c.lang AND a.tok0 = c.tok0 AND a.band = c.band
     AND a.doc_id < c.doc_id
    WHERE levenshtein(a.text, c.text) <= {_LEV_THRESHOLD}
    """,
)
def edit_distance_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by true edit distance, candidate-blocked on
    (lang, first token, token-count band) so the pairwise comparison is
    a bounded shuffle equi-join instead of a quadratic cross join."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        "lang",
        "text",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("tok0"),
        F.floor(F.size(F.split("text", " ", -1)) / _BAND_TOKENS).alias("band"),
    )
    a, c = b.alias("a"), b.alias("c")
    # The <=threshold filter is computed with the *banded* O(k.n)
    # levenshtein (threshold arg): it aborts as soon as the running
    # minimum exceeds k, which is 5-10x cheaper than the full DP on the
    # mostly-dissimilar in-block pairs.  Result set is identical to
    # full levenshtein <= k: the banded variant returns the exact
    # distance when <= k and -1 otherwise.
    #
    # Conjunct ORDER inside the join condition is the r14 optimization
    # (guide §1.2 "per-task work"): the old shape computed lev_dist in
    # a post-join withColumn + where, which Catalyst pushed into the
    # join condition as the FIRST conjunct — every hash-matched pair
    # (both orderings plus self-pairs, ~3x the blocked pair count)
    # paid the full banded DP before the cheap doc_id</|len diff|
    # tests could short-circuit it (plans/r14/edit_distance_near_dups
    # _before.txt operator (8)). Writing the banded levenshtein as the
    # LAST conjunct of an explicit join condition keeps And's
    # left-to-right short-circuit: self-pairs and reversed pairs die
    # on doc_id<, length outliers on the |len diff| bound, and only
    # genuinely comparable ordered pairs reach the DP. The projection
    # re-evaluates levenshtein only for SURVIVORS (result rows), which
    # is noise. Measured 4.43 s -> see _after probe.
    return (
        a.join(
            c,
            (F.col("a.lang") == F.col("c.lang"))
            & (F.col("a.tok0") == F.col("c.tok0"))
            & (F.col("a.band") == F.col("c.band"))
            & (F.col("a.doc_id") < F.col("c.doc_id"))
            & (
                F.abs(F.length("a.text") - F.length("c.text"))
                <= _LEV_THRESHOLD
            )
            & (
                F.levenshtein(
                    F.col("a.text"), F.col("c.text"), _LEV_THRESHOLD
                )
                >= 0
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("c.doc_id").alias("doc_id_b"),
            F.levenshtein(
                F.col("a.text"), F.col("c.text"), _LEV_THRESHOLD
            ).alias("lev_dist"),
        )
    )


@register(
    "gap_fill_daily_revenue",
    oracle="""
    WITH o AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders),
    daily AS (
      SELECT day, CAST(SUM(price) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM o GROUP BY day),
    spine AS (
      SELECT unnest(generate_series((SELECT min(day) FROM o),
                                    (SELECT max(day) FROM o),
                                    INTERVAL 1 DAY)) AS day)
    SELECT spine.day, coalesce(daily.revenue, 0.0) AS revenue,
           coalesce(daily.n_orders, 0) AS n_orders
    FROM spine LEFT JOIN daily USING (day)
    """,
)
def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue: calendar spine (sequence+explode) left-joined
    to the per-day aggregate, zero-filling days with no orders.  The
    aggregate side is bounded by the calendar (one row per day) no
    matter the input size, so it is always broadcast-able."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("DAY", "o_orderdate").alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    daily = o.groupBy("day").agg(
        F.sum("price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    spine = (
        o.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


@register(
    "trailing_window_7d",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events)
    SELECT event_id, user_id,
           CAST(SUM(v) OVER w AS DOUBLE) AS trail_value_7d,
           COUNT(*) OVER w AS n_events_7d
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_window_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user trailing-7-day value sum and
    event count, ordered by event time.  The frame is defined in epoch
    microseconds so RANGE arithmetic is engine-portable; values sum as
    exact decimals (order-independent) and only the final result drops
    to double.  Partitioned by user — one shuffle, then a single
    in-partition sort serves both window functions."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum("v").over(w).cast("double").alias("trail_value_7d"),
        F.count(F.lit(1)).over(w).alias("n_events_7d"),
    )


@register(
    "correlated_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
)
def correlated_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + self-join): orders priced >1.5x their own customer's
    average.  The inner average is an exact decimal sum divided as
    IEEE double, so the threshold compare is bit-identical across
    engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        """
    )


@register(
    "null_safe_join_counts",
    oracle="""
    WITH n AS (SELECT n_name, nullif(n_nationkey, 0) AS nk FROM nation),
    c AS (SELECT nullif(c_nationkey, 0) AS ck FROM customer)
    SELECT n_name, count(*) AS num_customers,
           max(ck IS NULL) AS key_was_null
    FROM c JOIN n ON c.ck IS NOT DISTINCT FROM n.nk
    GROUP BY n_name
    """,
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): nation 0's
    key is masked to NULL on both sides and still pairs up, unlike a
    plain equi-join which would drop it.  Dimension side broadcast."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_name", F.nullif(F.col("n_nationkey"), F.lit(0)).alias("nk")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("ck")
    )
    return (
        c.join(F.broadcast(n), F.col("ck").eqNullSafe(F.col("nk")))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.max(F.col("ck").isNull()).alias("key_was_null"),
        )
    )


@register(
    "union_by_name_evolution",
    oracle="""
    WITH u AS (
      SELECT o_orderkey AS id, CAST(o_totalprice AS DECIMAL(18,2)) AS amount,
             'orders' AS src
      FROM orders
      UNION ALL BY NAME
      SELECT event_id AS id, event_type AS etype, 'events' AS src
      FROM events
    )
    SELECT src, count(*) AS n_rows, count(amount) AS n_amount,
           count(etype) AS n_etype
    FROM u GROUP BY src
    """,
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: two relations with partially-overlapping
    columns combined by NAME (missing columns null-filled) — Spark
    ``unionByName(allowMissingColumns=True)`` == DuckDB ``UNION ALL BY
    NAME``.  The per-source non-null counts prove the fill pattern.
    This is the append path when a 100-TB table gains columns over
    time: no rewrite of old shards, readers reconcile by name."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount"),
        F.lit("orders").alias("src"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("etype"),
        F.lit("events").alias("src"),
    )
    return (
        o.unionByName(e, allowMissingColumns=True)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("amount").alias("n_amount"),
            F.count("etype").alias("n_etype"),
        )
    )


@register(
    "try_cast_gauntlet",
    oracle="""
    SELECT doc_id,
           TRY_CAST(split_part(text, ' ', 1) AS BIGINT) AS word_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS chars_roundtrip,
           TRY_CAST(lang AS DOUBLE) AS lang_as_double,
           TRY_CAST(NULL AS BIGINT) AS null_passthrough
    FROM documents
    """,
)
def try_cast_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casts over messy strings: Spark 4 runs ANSI mode by
    default, where a plain CAST of malformed input FAILS THE JOB — on
    a 100-TB corpus with inevitable dirty rows, ``try_cast`` (NULL on
    malformed, identical to DuckDB ``TRY_CAST``) is the ingestion
    contract.  Words cast to NULL, numeric round-trips survive."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1))
        .try_cast("bigint")
        .alias("word_as_int"),
        F.col("n_chars").cast("string").try_cast("bigint").alias(
            "chars_roundtrip"
        ),
        F.col("lang").try_cast("double").alias("lang_as_double"),
        F.lit(None).try_cast("bigint").alias("null_passthrough"),
    )


@register(
    "set_ops_bag_semantics",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk FROM customer),
    s AS (SELECT s_nationkey AS nk FROM supplier),
    ia AS (SELECT nk FROM c INTERSECT ALL SELECT nk FROM s),
    ea AS (SELECT nk FROM c EXCEPT ALL SELECT nk FROM s),
    i AS (SELECT nk, count(*) AS n FROM ia GROUP BY nk),
    e AS (SELECT nk, count(*) AS n FROM ea GROUP BY nk)
    SELECT coalesce(i.nk, e.nk) AS nationkey,
           coalesce(i.n, 0) AS n_intersect_all,
           coalesce(e.n, 0) AS n_except_all
    FROM i FULL JOIN e ON i.nk = e.nk
    """,
)
def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops: INTERSECT ALL keeps min(multiplicity)
    per value, EXCEPT ALL the multiplicity difference — the multiset
    laws a distinct-based rewrite gets wrong.  Per-nation counts of
    both prove multiplicities, not just membership."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    i = c.intersectAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("ni"))
    e = c.exceptAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("ne"))
    return (
        i.withColumnRenamed("nk", "ink")
        .join(e, F.col("ink") == F.col("nk"), "full_outer")
        .select(
            F.coalesce("ink", "nk").alias("nationkey"),
            F.coalesce("ni", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("ne", F.lit(0)).alias("n_except_all"),
        )
    )
