"""Oracle-differential tests for the relational corpus (sf0.01)."""

import pytest
from conftest import assert_oracle_match

RELATIONAL_QUERIES = [
    "filter_project",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "customer_order_stats_outer",
    "semi_join_customers_with_urgent",
    "anti_join_parts_never_ordered",
    "distinct_agg_having",
    "rollup_order_priority",
    "topk_expensive_orders",
    "set_ops_nations",
    "window_user_running",
    "window_top2_per_nation",
    "scalar_functions",
    "conditional_agg_case",
]


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_relational_oracle(spark, name):
    assert_oracle_match(spark, name)
