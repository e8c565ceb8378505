"""Hive-style partitioned writes + partition pruning — the layout
feature that turns 100-TB scans into single-partition reads."""

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    out = str(tmp_path / "orders_part")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)

    back = spark.read.parquet(out)
    one = back.where(F.col("o_orderpriority") == "1-URGENT")

    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan[:500]

    # Pruned read returns exactly the one directory's rows (note:
    # DataFrame.inputFiles() reports the PRE-pruning relation, so the
    # PartitionFilters plan check above is the pruning evidence).
    want = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == want


def test_partitioned_write_roundtrip_schema(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    out = str(tmp_path / "orders_part2")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
