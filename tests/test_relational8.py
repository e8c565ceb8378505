"""Oracle-differential tests for relational corpus part 8."""

import pytest
from conftest import assert_oracle_match

QUERIES8 = [
    "disjunctive_predicate_revenue",
    "latest_shipper_per_order",
    "global_sales_opportunity",
    "ntile_window_stats",
    "map_column_functions",
]


@pytest.mark.parametrize("name", QUERIES8)
def test_relational8_oracle(spark, name):
    assert_oracle_match(spark, name)
