"""File sources & sinks.

The reference's only source is a POSIX directory scan keeping regular
files (``parse_input``, FileWordCounter.cpp:189-226, S_ISREG filter at
:218) followed by a whole-file read into one string (``loadFile``,
FileWordCounter.cpp:139-147). ``scan_directory`` reproduces exactly
that contract on Spark's distributed file source; everything else is
the connector surface a Spark engine gets for free and this engine
exposes uniformly (text/CSV/JSON/Parquet, read and write).

Scale: ``wholeTextFiles`` keeps one file per record — correct parity,
but a 100-TB corpus should use line- or block-oriented formats
(read.text / parquet) so splits don't degenerate to whole files; the
word-count workload only needs bag-of-tokens, so ``read.text`` is the
scale path (``wordcount_directory`` uses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_directory(spark: SparkSession, dir_path: str) -> DataFrame:
    """Directory scan + whole-file load: one row per regular file,
    columns (path, content) — the reference's InputVec of
    (file path, file text) with K1=nullptr semantics (the path is
    carried as data, not key)."""
    rdd = spark.sparkContext.wholeTextFiles(dir_path)
    return spark.createDataFrame(rdd, schema="path string, content string")


def wordcount_directory(spark: SparkSession, dir_path: str) -> DataFrame:
    """The complete reference workload (C1-C6) over a directory of
    text files, on the scalable line-oriented source: every line keeps
    its file's identity implicitly — word counts don't need it
    (the per-file pre-aggregation of FileWordCounter.cpp:87-118 is
    Spark's automatic partial aggregation)."""
    lines = spark.read.text(dir_path)
    # Lines within a file were joined by '\n'; the reference tokenizes
    # the whole file on ' ' only, so newline-adjacent tokens differ.
    # For single-line files (our corpus) the two are identical.
    return (
        lines.select(F.explode(F.split(F.col("value"), " ", -1)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def write_read_csv(df: DataFrame, path: str) -> DataFrame:
    """CSV round-trip with header + explicit schema re-application
    (CSV is schemaless; reading back with the writer's schema is the
    lossless pattern). Two defaults silently break the round-trip and
    are overridden here (code-review r8): the reader parses per
    physical line unless ``multiLine`` is set, so a quoted string
    containing '\\n' would split into malformed rows; and both sides'
    default ``nullValue`` is the empty string, so '' would come back
    NULL — writing NULL as an explicit sentinel and quoting empty
    strings (``emptyValue``) keeps ''/NULL distinct. The sentinel
    trade-off is documented: a literal string equal to the sentinel
    would alias to NULL; pick a different sentinel via a wrapper if
    the data can contain it."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .csv(path)
    )
    return (
        df.sparkSession.read.schema(df.schema)
        .option("header", True)
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )


def write_read_json(df: DataFrame, path: str) -> DataFrame:
    """JSON-lines round-trip with explicit schema (avoids inference
    jobs and type drift)."""
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(df.schema).json(path)


def write_read_parquet(df: DataFrame, path: str) -> DataFrame:
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def write_read_orc(df: DataFrame, path: str) -> DataFrame:
    """ORC round-trip — the other columnar format Spark ships a
    vectorized reader for; schema travels with the file like parquet."""
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)


def write_read_xml(df: DataFrame, path: str, row_tag: str = "row") -> DataFrame:
    """XML round-trip (Spark 4 built-in source). Schemaless on disk
    like CSV/JSON, so reading back re-applies the writer's schema."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)
    return (
        df.sparkSession.read.schema(df.schema)
        .format("xml")
        .option("rowTag", row_tag)
        .load(path)
    )
