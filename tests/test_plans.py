"""Plan-shape regression tests: the optimizations SCALE.md claims must
stay in the physical plans."""

from conftest import SF_CORRECTNESS

from map_reduce_library_spark.queries import QUERIES


def _plan(spark, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_project_pushdown_and_pruning(spark):
    p = _plan(spark, "filter_project")
    pushed = p.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed and "l_returnflag" in pushed
    schema = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_tax" not in schema and "l_linestatus" not in schema  # pruned


def test_star_join_broadcasts_dims(spark):
    p = _plan(spark, "local_supplier_volume")
    assert "BroadcastHashJoin" in p
    assert "BroadcastExchange" in p


def test_topk_uses_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "topk_expensive_orders")


def test_aggregate_is_partial_then_final(spark):
    p = _plan(spark, "pricing_summary")
    # two HashAggregate levels (partial + final) around one exchange
    assert p.count("HashAggregate") >= 2


def test_no_cartesian_products_in_relational_corpus(spark):
    for name in [
        "shipping_priority",
        "local_supplier_volume",
        "large_volume_customers",
        "min_cost_per_part",
    ]:
        assert "CartesianProduct" not in _plan(spark, name), name


def test_q7_volume_shipping_broadcasts_all_dims(spark):
    p = _plan(spark, "volume_shipping")
    # nation/supplier/customer chains broadcast; the only shuffle join
    # is lineitem⋈orders.
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_q8_market_share_no_cartesian_all_dims_broadcast(spark):
    p = _plan(spark, "market_share")
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p


def test_q17_joinback_shuffles_on_partkey(spark):
    p = _plan(spark, "small_quantity_revenue")
    assert "hashpartitioning(l_partkey" in p


def test_q20_supplier_semi_join_is_broadcast(spark):
    p = _plan(spark, "promo_part_suppliers")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_q11_single_row_total_is_broadcast_not_shuffled(spark):
    p = _plan(spark, "important_part_value")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """When a selective filter sits on one side of a shuffle join,
    Spark injects a runtime bloom filter (bloom_filter_agg /
    might_contain) on the other side's scan — row-level semi-join
    pushdown without bucketing. Broadcast joins don't need it (the
    filter rides the broadcast), so broadcast is disabled to pin the
    shuffle-join path the 100-TB fact⋈fact case hits."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.tables import load_table

    keep = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        o = load_table(spark, SF_CORRECTNESS, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_CORRECTNESS, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_edit_distance_join_is_blocked_not_cartesian(spark):
    # the pairwise comparison must ride the blocking key as an
    # equi-join; a cartesian/BNLJ here would be quadratic at scale
    p = _plan(spark, "edit_distance_near_dups")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_gap_fill_broadcasts_bounded_daily_aggregate(spark):
    # the per-day aggregate is calendar-bounded -> must broadcast
    p = _plan(spark, "gap_fill_daily_revenue")
    assert "BroadcastHashJoin" in p


def test_null_safe_join_stays_broadcast(spark):
    # eqNullSafe must not fall back to a nested-loop plan
    p = _plan(spark, "null_safe_join_counts")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_trailing_window_single_shuffle_one_sort(spark):
    # both window functions share one (partitionBy user, orderBy us)
    # spec -> exactly one exchange feeding one Window operator
    p = _plan(spark, "trailing_window_7d")
    assert p.count("Window") >= 1
    assert p.count("Exchange") == 1


def test_correlated_subquery_decorrelates_to_join(spark):
    # Catalyst must rewrite the correlated scalar subquery into an
    # aggregate + equi-join, never a per-row nested-loop re-execution
    p = _plan(spark, "correlated_above_customer_avg")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_join_strategy_hints_are_honored(spark):
    """Per-join physical-strategy control: hints force SMJ /
    shuffled-hash / broadcast regardless of size estimates — the
    escape hatch when stats mislead the planner at scale."""
    o = spark.read.parquet(f"{SF_CORRECTNESS}/orders.parquet")
    c = spark.read.parquet(f"{SF_CORRECTNESS}/customer.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    j = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in plan(j)
    j = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in plan(j)
    j = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in plan(j)
