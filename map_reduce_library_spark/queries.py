"""Query registry: the driver-checked corpus.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, spark_callable, oracle_sql)`` triple. The spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL
DuckDB runs on the same parquet (omitted only for genuinely
non-SQL-expressible operators — the driver then records a weaker
rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark plan and the SQL so the driver's sorted-by-name value hash
compares apples to apples.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its DuckDB oracle) to the corpus."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# Registration modules (import side-effects populate the registry).
from map_reduce_library_spark.querydefs import wordcount  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational2  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational3  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational4  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational5  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational6  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational7  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational8  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational9  # noqa: E402,F401
from map_reduce_library_spark.querydefs import extensibility  # noqa: E402,F401
from map_reduce_library_spark.querydefs import text  # noqa: E402,F401
from map_reduce_library_spark.querydefs import dedup  # noqa: E402,F401  (needs text's oracle)
from map_reduce_library_spark.querydefs import similarity  # noqa: E402,F401
from map_reduce_library_spark.querydefs import mapreduce_parity  # noqa: E402,F401
from map_reduce_library_spark.querydefs import multimodal  # noqa: E402,F401
from map_reduce_library_spark.querydefs import streaming  # noqa: E402,F401
from map_reduce_library_spark.querydefs import approx  # noqa: E402,F401
from map_reduce_library_spark.querydefs import temporal  # noqa: E402,F401
from map_reduce_library_spark.querydefs import pipeline  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational10  # noqa: E402,F401
from map_reduce_library_spark.querydefs import cogroup  # noqa: E402,F401
