"""Edge inputs: empty tables, single rows, and the SQL-registered UDF
surface."""

from conftest import assert_oracle_match

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def test_streaming_sliding_window_oracle(spark):
    assert_oracle_match(spark, "streaming_sliding_window")


def test_operators_on_empty_input(spark):
    from map_reduce_library_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash,
    )
    from map_reduce_library_spark.operators.text import text_stats
    from map_reduce_library_spark.operators.wordcount import word_counts

    empty = spark.createDataFrame(
        [],
        StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        ),
    )
    assert word_counts(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0
    assert simhash(empty).count() == 0
    assert text_stats(empty).count() == 0


def test_single_doc_no_self_pairs(spark):
    from map_reduce_library_spark.operators.dedup import minhash_lsh_pairs

    one = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    assert minhash_lsh_pairs(one).count() == 0  # needs a<b pair


def test_sql_registered_udf(spark):
    # The UDF registration surface: python fn → SQL-callable.
    spark.udf.register("tok_count", lambda s: len(s.split(" ")), "int")
    spark.createDataFrame([("a b c",), ("x",)], ["t"]).createOrReplaceTempView(
        "udf_probe"
    )
    rows = spark.sql(
        "SELECT tok_count(t) AS n FROM udf_probe ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 3]
