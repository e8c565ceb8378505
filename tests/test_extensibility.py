"""Python UDTF + custom Python DataSource."""

from conftest import SF_CORRECTNESS, assert_oracle_match

from map_reduce_library_spark.queries import QUERIES


def test_udtf_token_stats_oracle(spark):
    assert_oracle_match(spark, "udtf_token_stats")


def test_python_datasource_oracle(spark):
    assert_oracle_match(spark, "python_datasource_scan")


def test_python_datasource_is_partition_parallel(spark):
    df = QUERIES["python_datasource_scan"](spark, SF_CORRECTNESS)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
