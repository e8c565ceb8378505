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
