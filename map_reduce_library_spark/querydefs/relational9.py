"""Relational corpus, part 9: the remaining classic TPC-H join/subquery
shapes, adapted to this testdata schema (no partsupp table, no
commitdate): Q7 volume shipping, Q8 market share, Q9 profit by
nation/year, Q11 important-value HAVING-vs-scalar, Q17 correlated
per-group average comparison, Q20 nested-IN supplier selection.

Reference capability anchor: the reference's single-input map/group/
reduce envelope (/root/reference/MapReduceFramework.h:43-46) has no
joins at all (SURVEY.md §2D); these are declarative extensions whose
physical plans lean on broadcast joins for every dimension chain so
only fact-table shuffles remain.

Cross-engine determinism: every money aggregate follows the
decimal-accumulate / double-result discipline from
operators/relational.py; average comparisons are cross-multiplied in
exact decimals so both engines make identical boundary decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.relational import dec
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


@register(
    "volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: six-table join with a disjunctive nation pairing.

    Physical stance: nation is broadcast twice (25 rows), supplier and
    customer are broadcast (dimension-sized), so the only shuffle is
    the lineitem⋈orders fact-fact equi-join — one exchange on
    orderkey regardless of scale. The nation-pair disjunction is a
    post-broadcast filter, never a shuffle key."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp_n = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
    )
    GROUP BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, per year — a conditional-sum ratio over an 8-table join.

    Both the numerator and denominator are exact decimal sums cast to
    double before one IEEE division per year, so the ratio is
    bit-identical across engines. All dimensions broadcast; the only
    shuffles are the two fact-fact joins (lineitem⋈orders on
    orderkey) and the final tiny groupBy(o_year)."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust_in_region = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_n = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = _rev()
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(
            F.broadcast(cust_in_region),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(nation_vol).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "product_type_profit",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))
             - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))
               * CAST(0.10 AS DECIMAL(3,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp ⟹ supply cost modeled as 10% of
    p_retailprice × quantity): profit by supplier nation and order
    year for parts matching a name pattern.

    The profit expression stays entirely in exact decimals —
    (12,2)×(12,2)×(3,2) keeps precision ≤ 38 so neither engine
    rounds — and is summed exactly before one cast to double."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    supp_n = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    d12 = "decimal(12,2)"
    amount = dec("l_extendedprice", d12) * (
        F.lit(1) - dec("l_discount", d12)
    ) - dec("p_retailprice", d12) * dec("l_quantity", d12) * F.lit(
        "0.10"
    ).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "important_part_value",
    oracle="""
    WITH value_per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT SUM(val) AS tot, COUNT(*) AS n FROM value_per_part)
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM value_per_part, total
    WHERE val * n * 10 > tot * 11
    """,
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp ⟹ "stock value" is lifetime traded
    value per part): keep parts whose value exceeds 1.1× the average
    per-part value — a HAVING against an uncorrelated scalar subquery.
    The relative threshold is scale-free (TPC-H's own Q11 fraction is
    1/SF for the same reason), so the query stays selective-but-
    nonempty at every sf.

    The threshold test cross-multiplies in exact decimals and integers
    (val*n*10 > tot*11), so the boundary decision is bit-identical in
    both engines. Spark-first: one shuffle for the per-part agg; the
    1-row global total re-aggregates from the already-reduced per-part
    values (cheap second pass over ~|parts| rows, not lineitem) and is
    broadcast back via crossJoin."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("val"))
    total = per.agg(
        F.sum("val").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .where(F.col("val") * F.col("n") * 10 > F.col("tot") * 11)
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH stats AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN stats USING (l_partkey)
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * n * 5 < sum_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lineitems whose quantity is below 20% of the average
    quantity for their part — a correlated scalar-average subquery,
    decorrelated into one per-part aggregate joined back to the fact.

    The "qty < 0.2 * avg" test is cross-multiplied into exact
    integers/decimals (qty * n * 5 < sum_qty) so no float-average
    boundary can flip between engines. Both sides of the join-back
    shuffle on l_partkey — at scale AQE plans this as one exchange of
    the fact plus a small aggregated side."""
    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = li.join(stats, "l_partkey")
    return (
        joined.where(
            dec("l_quantity") * F.col("n") * 5 < F.col("sum_qty")
        ).agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "promo_part_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    """,
)
def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp ⟹ "has excess stock" becomes
    "shipped more than a threshold"): suppliers selected via a nested
    IN whose inner query is itself a filtered join + HAVING aggregate.

    Spark-first decorrelation: inner aggregate → left-semi join into
    supplier. The part dimension is broadcast into the lineitem scan,
    the HAVING aggregate shuffles only the PROMO/1998 slice on
    l_suppkey, and the final semi join broadcasts the few qualifying
    supplier keys — the full supplier table is never shuffled."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


@register(
    "sole_blame_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
)
def sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's join shape (suppliers solely to blame in
    multi-supplier orders) adapted to this schema's returnflag (no
    commitdate/receiptdate in the testdata): count, per supplier,
    their returned lines in orders that involve ANOTHER supplier
    (correlated EXISTS) where NO other supplier's line was returned
    (correlated NOT EXISTS).

    Spark-first, r14 shape (guide §2.4 "remove shuffles outright"):
    the round-13 form computed the per-(order,supplier) aggregate,
    RE-aggregated it per order, and joined both back onto the R
    lines — Catalyst planned that as THREE lineitem scans with the
    per_os aggregation duplicated (plans/r14/sole_blame_suppliers_
    before.txt: two independent Exchange+HashAggregate chains over
    the same subtree, no exchange reuse). This form needs the fact
    table ONCE: one groupBy to per-(order,supplier) returned-line
    counts, then window aggregates over l_orderkey decide both
    quantifiers (o_supps = suppliers in the order, o_ret = returned
    lines in the order), and numwait(s) = SUM of n_ret over the
    qualifying (order, supplier) pairs — identical to counting the
    joined-back R lines, because each R line of a qualifying pair is
    one of its n_ret. n_ret > 0 keeps suppliers with zero returned
    lines out of the output, exactly as the old R-line join did.
    Exact integer arithmetic throughout — bit-identical results."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_ret"),
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        per_os.withColumn("o_ret", F.sum("n_ret").over(w))
        .withColumn("o_supps", F.count(F.lit(1)).over(w))
        # I have returned lines...
        .where(F.col("n_ret") > 0)
        # ...another supplier exists in the order...
        .where(F.col("o_supps") > 1)
        # ...and every returned line in the order is mine
        .where(F.col("o_ret") == F.col("n_ret"))
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        blamed.join(
            F.broadcast(s), blamed.l_suppkey == s.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.sum("n_ret").alias("numwait"))
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, zeroes
    included via the left join. Two-level aggregation — the second
    groupBy's input is one row per customer, and its key cardinality
    (distinct order counts) is tiny, so the big shuffle is only the
    first, on c_custkey."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier(s) by quarterly revenue — the
    aggregate-view-reused-twice shape (once for per-supplier revenue,
    once for its scalar max) with exact tie semantics. Spark-first:
    the revenue aggregate is computed once and window-ranked
    (max over an empty partition of the TINY aggregated relation —
    one row per supplier, not corpus rows), avoiding DuckDB's
    second scan of the CTE; decimal accumulation keeps both engines'
    boundary decisions identical."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1) - dec("l_discount"))
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    ranked = rev.withColumn(
        "__mx", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        F.broadcast(ranked)
        .join(s, ranked.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "parts_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16's shape (distinct-supplier counts per part attribute
    with an uncorrelated NOT-IN supplier exclusion), adapted to this
    schema: lineitem is the part↔supplier bridge (no partsupp table)
    and the excluded set is negative-balance suppliers (no comment
    column). Spark-first: the exclusion list is a broadcast left-anti
    join plus the FULL three-valued NOT IN semantics (an anti-join
    alone keeps NULL-suppkey rows that SQL's NOT IN drops whenever
    the exclusion list is non-empty — code-review r6; the one-row
    list-size scalar broadcast makes the empty-list case, where NOT
    IN is vacuously true even for NULL, exact too). The part
    dimension broadcasts into the fact scan with the p_size IN filter
    pushed down, and the distinct count shuffles (brand, type, size,
    suppkey) partial-deduped map-side."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    n_bad = bad.agg(F.count(F.lit(1)).alias("__n_bad"))
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size").isin(1, 5, 9, 13))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .crossJoin(F.broadcast(n_bad))
        .where(F.col("l_suppkey").isNotNull() | (F.col("__n_bad") == 0))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= DATE '1995-10-01'
      AND o.o_orderdate < DATE '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items
    in a quarter. Spark-first: the date-filtered orders slice joins
    the returnflag-filtered lineitem on the order key (both filters
    pushed to the scans), the customer dimension broadcasts, the agg
    is decimal-exact, and the top-20 pins TakeOrderedAndProject (no
    global sort materialization). Deterministic tiebreak on c_custkey
    keeps the LIMIT identical cross-engine."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
    )
