"""Oracle-differential tests for relational corpus part 2."""

import pytest
from conftest import assert_oracle_match

QUERIES2 = [
    "json_extract_props",
    "pivot_status_by_priority",
    "cube_returnflag_linestatus",
    "above_avg_orders",
    "regex_like_filters",
    "date_arithmetic",
    "array_functions",
    "null_handling",
]


@pytest.mark.parametrize("name", QUERIES2)
def test_relational2_oracle(spark, name):
    assert_oracle_match(spark, name)
