"""Oracle-differential tests for relational corpus part 6."""

import pytest
from conftest import assert_oracle_match

QUERIES6 = [
    "higher_order_functions",
    "window_frames",
    "argmax_aggregates",
    "posexplode_tokens",
]


@pytest.mark.parametrize("name", QUERIES6)
def test_relational6_oracle(spark, name):
    assert_oracle_match(spark, name)
