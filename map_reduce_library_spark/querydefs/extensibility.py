"""Python-level engine extensibility: a real ``@udtf`` table function
and a custom ``pyspark.sql.datasource`` DataSource.

The reference's entire API *is* a UDTF+UDAF pair (``map`` = flat-map
UDTF, ``reduce`` = holistic UDAF — MapReduceClient.h:74,83); here the
same generality is exposed through Spark's first-class extension
points rather than a private framework: ``udtf`` for SQL-callable
table functions, the DataSource API for user-defined connectors.

Worker-pickling invariant (see conftest/repo docs): every class shipped
to executors is defined INSIDE the query function so cloudpickle
serializes it by value — executors do not have this repo on their
PYTHONPATH under the external driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


@register(
    "udtf_token_stats",
    oracle="""
    SELECT doc_id, pos, token,
           CAST(length(token) AS INT) AS n_chars
    FROM (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(string_split(text, ' '))))
                  - 1 AS INT) AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    WHERE doc_id < 50
    """,
)
def udtf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuine Python UDTF (SQL-callable table function, Spark 3.5+):
    one input row → n output rows with positional token stats. This is
    the reference's ``map`` contract (0..n emits per input,
    MapReduceClient.h:69) surfaced as a first-class engine extension
    instead of a framework callback.

    Row-at-a-time Python is the slow path by design here — the point
    is the API surface; the hot-path equivalent is `posexplode`
    (see ``posexplode_tokens``). Restricted to 50 docs to keep the
    Python cost a rounding error in the bench."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string, n_chars int")
    class TokenStats:
        def eval(self, doc_id, text):
            if text is None:
                # NULL text contributes no rows — the same absent-row
                # semantics the oracle's string_split(NULL) -> unnest
                # produces; unguarded, None.split crashed the whole
                # job while DuckDB returned quietly (code-review r6).
                return
            for pos, token in enumerate(text.split(" ")):
                yield doc_id, pos, token, len(token)

    spark.udtf.register("token_stats", TokenStats)
    (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .createOrReplaceTempView("udtf_docs_in")
    )
    # The canonical UDTF call site: a SQL LATERAL join — each input
    # row fans out through the table function.
    return spark.sql(
        "SELECT s.doc_id, s.pos, s.token, s.n_chars "
        "FROM udtf_docs_in, LATERAL token_stats(doc_id, text) s"
    )


_RANGEGEN_CLS = None


def _rangegen_source():
    """Build the DataSource class ONCE per process (cached): repeated
    calls then register byte-identical pickled state, so plan-time
    Python workers and any command-level caching can be reused across
    invocations instead of treating every call as a brand-new source.
    The classes stay function-local so cloudpickle serializes them by
    value (executors lack this repo on PYTHONPATH under the external
    driver)."""
    global _RANGEGEN_CLS
    if _RANGEGEN_CLS is not None:
        return _RANGEGEN_CLS
    import hashlib

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RangeGenReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 200))
            self.parts = int(options.get("partitions", 4))

        def partitions(self):
            step = -(-self.n // self.parts)
            return [
                InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, hashlib.md5(str(i).encode()).hexdigest(), i % 7)

    class RangeGenSource(DataSource):
        @classmethod
        def name(cls):
            return "rangegen"

        def schema(self):
            return "id bigint, payload string, bucket bigint"

        def reader(self, schema):
            return RangeGenReader(self.options)

    _RANGEGEN_CLS = RangeGenSource
    return _RANGEGEN_CLS


@register(
    "python_datasource_scan",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id,
           md5(CAST(i AS VARCHAR)) AS payload,
           CAST(i % 7 AS BIGINT) AS bucket
    FROM generate_series(0, 199) t(i)
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A custom connector through the Python DataSource API (Spark 4):
    a deterministic generator source that plans N partitions and
    produces rows executor-side — the pattern for wrapping any
    external system (REST API, proprietary format) as a first-class,
    partition-parallel Spark source. No driver-side materialization:
    each partition generates only its own slice. Registration runs
    unconditionally: ``spark.dataSource.register`` is SparkSession-
    scoped state and silently overwrites an existing name, so a guard
    adds only failure modes — the r6 applicationId key skipped a
    second session in the same application (DATA_SOURCE_NOT_FOUND),
    and an id(spark) key can collide after a session is GC'd and a
    new one reuses the address (code-review/ADVICE r6). The class is
    process-cached (``_rangegen_source``) so repeat registrations
    pickle byte-identical state."""
    spark.dataSource.register(_rangegen_source())
    return (
        spark.read.format("rangegen")
        .option("n", 200)
        .option("partitions", 4)
        .load()
    )


@register(
    "pandas_udaf_median_chars",
    oracle="""
    SELECT lang, source, median(n_chars) AS med_chars
    FROM documents GROUP BY 1, 2
    """,
)
def pandas_udaf_median_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas UDAF surface (the third Python
    extension point next to @udtf and the DataSource API): a
    SQL-registered Arrow-batched aggregate, exercised through
    spark.sql so registration + codegen integration are both on the
    path. Median keeps the differential float-free (integer inputs;
    an even group midpoints to an exact .5). Per-group state is one
    column batch — the same bounded-group contract as the
    applyInPandas holistic reduce (mr_holistic_median), but callable
    anywhere SQL aggregates go."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module's
    # `from __future__ import annotations` turns type hints into
    # strings, which the pandas_udf eval-type inferencer rejects.
    median_chars = pandas_udf(
        lambda v: float(v.median()),
        "double",
        PandasUDFType.GROUPED_AGG,
    )

    spark.udf.register("median_chars", median_chars)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udaf_docs_in"
    )
    return spark.sql(
        "SELECT lang, source, median_chars(n_chars) AS med_chars "
        "FROM udaf_docs_in GROUP BY lang, source"
    )
