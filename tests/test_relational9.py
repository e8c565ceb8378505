"""Oracle-differential tests for relational corpus part 9."""

import pytest
from conftest import assert_oracle_match

QUERIES9 = [
    "volume_shipping",
    "market_share",
    "product_type_profit",
    "important_part_value",
    "small_quantity_revenue",
    "promo_part_suppliers",
    "sole_blame_suppliers",
    "customer_order_distribution",
    "top_supplier_revenue",
    "parts_supplier_relationship",
    "returned_item_reporting",
]


@pytest.mark.parametrize("name", QUERIES9)
def test_relational9_oracle(spark, name):
    assert_oracle_match(spark, name)
