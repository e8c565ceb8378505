"""Oracle-differential tests for relational corpus part 7."""

import pytest
from conftest import assert_oracle_match

QUERIES7 = [
    "order_priority_checking",
    "shipmode_priority",
    "promo_revenue_pct",
]


@pytest.mark.parametrize("name", QUERIES7)
def test_relational7_oracle(spark, name):
    assert_oracle_match(spark, name)
