"""Oracle-differential tests for relational corpus part 3."""

import pytest
from conftest import assert_oracle_match

QUERIES3 = [
    "listagg_nations_per_region",
    "exact_percentiles",
    "value_histogram",
    "unpivot_customer_metrics",
]


@pytest.mark.parametrize("name", QUERIES3)
def test_relational3_oracle(spark, name):
    assert_oracle_match(spark, name)
