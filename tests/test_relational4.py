"""Oracle-differential tests for relational corpus part 4."""

import pytest
from conftest import assert_oracle_match

QUERIES4 = [
    "stat_aggregates",
    "grouping_sets_explicit",
    "hypertable_rollup_daily",
]


@pytest.mark.parametrize("name", QUERIES4)
def test_relational4_oracle(spark, name):
    assert_oracle_match(spark, name)
