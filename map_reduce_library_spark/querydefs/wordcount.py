"""Flagship word-count query (reference workload C1-C6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from map_reduce_library_spark.operators.wordcount import word_counts
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


@register(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count every space-delimited token across the documents corpus.

    Empty-token semantics per the reference tokenizer
    (FileWordCounter.cpp:149-177): consecutive/leading/trailing spaces
    yield empty-string tokens, which are counted like any word — both
    Spark ``split(text, ' ', -1)`` and DuckDB ``string_split`` keep
    them.
    """
    return word_counts(load_table(spark, sf_dir, "documents"), "text")
