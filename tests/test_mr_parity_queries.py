"""Driver-contract queries that exercise the generic MR layer."""

import pytest
from conftest import assert_oracle_match

MR_QUERIES = [
    "mr_generic_wordcount",
    "mr_holistic_median",
    "mr_multi_emit_extremes",
    "mr_zero_emit_filter",
    "mr_sink_wordcount",
]


@pytest.mark.parametrize("name", MR_QUERIES)
def test_mr_parity_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_mr_combiner_and_sortmode_oracles(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "mr_combiner_wordcount")
    assert_oracle_match(spark, "mr_sortmode_wordcount")
