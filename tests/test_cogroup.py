"""Cogroup coverage: oracle match plus the one-sided-group semantics
the SQL full join alone wouldn't prove end-to-end."""

from conftest import assert_oracle_match


def test_cogroup_oracle(spark):
    assert_oracle_match(spark, "cogroup_nation_balance")


def test_cogroup_emits_one_sided_groups(spark):
    """A key present in only one input must still reach the merge
    function, with the other side empty (full-outer cogroup)."""
    import pandas as pd

    left = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    right = spark.createDataFrame([(2, 5.0), (3, 7.0)], "k long, w double")

    def merge(lf, rf):
        k = int(lf["k"].iloc[0] if len(lf) else rf["k"].iloc[0])
        return pd.DataFrame([{"k": k, "nl": len(lf), "nr": len(rf)}])

    out = {
        r["k"]: (r["nl"], r["nr"])
        for r in left.groupBy("k")
        .cogroup(right.groupBy("k"))
        .applyInPandas(merge, "k long, nl long, nr long")
        .collect()
    }
    assert out == {1: (1, 0), 2: (1, 1), 3: (0, 1)}
