"""Bucketed joins must produce correct results with zero shuffle
exchanges on the bucketed sides."""

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from map_reduce_library_spark.operators.bucketing import (
    bucketed_join,
    exchanges_in_plan,
    write_bucketed,
)


def test_bucketed_join_no_exchange_and_correct(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumn(
        "o_orderkey", F.col("l_orderkey")
    )

    write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", buckets=8)
    try:
        # Disable broadcast so the test exercises the bucketed path
        # (at real scale neither side would broadcast anyway).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        agg = joined.groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n_items")
        )

        assert exchanges_in_plan(joined) == 0, "bucketed join must not shuffle"
        # The groupBy key equals the bucket key → also exchange-free.
        assert exchanges_in_plan(agg) == 0

        want = (
            orders.join(lineitem.drop("o_orderkey"),
                        orders.o_orderkey == lineitem.l_orderkey)
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_exchanges_in_plan_stable_across_execution(spark):
    """code-review r8 (verified): after an action, the AQE plan's
    toString appends an '== Initial Plan ==' section that used to
    double the exchange count exactly when auditing is most natural."""
    from map_reduce_library_spark.operators.bucketing import (
        exchanges_in_plan,
    )

    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    before = exchanges_in_plan(df)
    df.collect()
    assert exchanges_in_plan(df) == before == 1
