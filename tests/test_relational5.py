"""Oracle-differential tests for relational corpus part 5."""

import pytest
from conftest import assert_oracle_match

QUERIES5 = [
    "three_valued_in_semantics",
    "min_cost_per_part",
    "large_volume_customers",
]


@pytest.mark.parametrize("name", QUERIES5)
def test_relational5_oracle(spark, name):
    assert_oracle_match(spark, name)
