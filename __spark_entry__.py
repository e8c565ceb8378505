"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship word-count query at sf0.001 (smoke check).
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching ANSI SQL for DuckDB, same column names.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from map_reduce_library_spark.queries import ORACLES, QUERIES  # noqa: E402
from map_reduce_library_spark.operators.wordcount import word_counts  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's shipped workload: word count over a document corpus
    (FileWordCounter.cpp; README.md:42-53), Spark-first:
    scan → split → explode → groupBy(word) → count.
    """
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return word_counts(docs, "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column
    names; tables pre-registered as views)."""
    return dict(ORACLES)
