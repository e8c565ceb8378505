"""Skew utilities must preserve exact semantics vs unsalted plans."""

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.skew import salted_join, two_phase_agg


def _skewed_df(spark):
    # 90% of rows on one key — the pathological shape.
    return spark.range(0, 20000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 50) END AS k",
        "cast(id AS double) AS v",
    )


def test_salted_join_equals_plain_join(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k7", 3)], ["k", "tag"]
    )
    want = sorted(
        tuple(r) for r in left.join(right, "k").select("k", "v", "tag").collect()
    )
    got = sorted(
        tuple(r)
        for r in salted_join(left, right, "k", salt=8)
        .select("k", "v", "tag")
        .collect()
    )
    assert got == want


def test_salted_left_join_preserves_unmatched(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame([("hot", 1)], ["k", "tag"])
    plain = left.join(right, "k", "left").select("k", "v", "tag")
    salted = salted_join(left, right, "k", salt=8, how="left").select(
        "k", "v", "tag"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_two_phase_agg_equals_direct(spark):
    df = _skewed_df(spark)
    want = {
        (r.k, r.s, r.c)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(28,2)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    got = {
        (r.k, r.sum_v, r.cnt) for r in two_phase_agg(df, "k", "v", salt=8).collect()
    }
    assert got == want


def test_salted_join_rejects_right_and_full_outer(spark):
    # The replicated right side would emit each unmatched right row
    # `salt` times under right/full outer semantics.
    import pytest

    left = _skewed_df(spark)
    right = spark.createDataFrame([("hot", 1)], ["k", "tag"])
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", salt=8, how=how)


def test_two_phase_agg_salt_is_deterministic(spark):
    # The salt must be a pure function of row content (never
    # monotonically_increasing_id): on a stage retry every row must
    # land in the same (key, salt) partial or partials double-count.
    df = _skewed_df(spark)
    from map_reduce_library_spark.operators.skew import F as _F  # noqa: F401
    from pyspark.sql import functions as SF

    salted = df.withColumn(
        "__salt", SF.pmod(SF.xxhash64(*df.columns), SF.lit(8))
    )
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_skew_query_oracles(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "skew_two_phase_agg")
    assert_oracle_match(spark, "skew_salted_join")


def test_salted_ops_refuse_salt_column_collision(spark):
    """code-review r8: a pre-existing __salt column used to be
    silently clobbered and then dropped from the output."""
    import pytest

    from map_reduce_library_spark.operators.skew import (
        salted_join,
        two_phase_agg,
    )

    left = spark.range(10).selectExpr("id AS k", "id AS __salt")
    right = spark.range(10).selectExpr("id AS k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(left, right, "k")
    with pytest.raises(ValueError, match="__salt"):
        two_phase_agg(left, "k", "k")
