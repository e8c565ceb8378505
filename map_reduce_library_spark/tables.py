"""Loaders for the driver-generated testdata tables.

Tables (TESTDATA.md): TPC-H-ish star schema ``region nation customer
supplier part orders lineitem`` plus ``events`` (timestamped stream
table), ``documents`` (text corpus) and ``embeddings``
(``array<float>`` vectors).

Design stance: always go through ``spark.read.parquet`` so the
vectorized Parquet reader, predicate pushdown, and column pruning are
in play — the reference's only source is a POSIX directory scan with
whole-file reads (FileWordCounter.cpp:189-226,139-147); Parquet +
pushdown is the Spark-native upgrade of that capability.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Make ``spark`` able to read TIMESTAMP(NANOS) parquet.

    Sessions from our ``session.get_session`` already carry both flags
    (set at build time — side-effect-free). For externally-created
    sessions (the correctness driver's), set them only when missing:
    an idempotent compatibility shim, not a per-read mutation.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        # UTC so the TIMESTAMP_LTZ behaves like the oracle's
        # timezone-naive micros under date_trunc/window.
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame, ts_type) -> DataFrame:
    """events.ts has shipped as parquet TIMESTAMP(NANOS) (rejected by
    Spark's reader unless nanosAsLong reads it as int64) and as plain
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize either layout
    to TIMESTAMP_LTZ under the pinned UTC session zone so
    watermarks/windows downstream see one type and the values match
    DuckDB's timezone-naive micros exactly. ONE definition shared by
    the batch loader and the streaming reader
    (streaming/events.py::read_events_stream) — the two copies this
    replaces could drift apart and make batch and stream read
    different values from the same file."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(ts_type, LongType):
        # nanos as int64 -> micros. DuckDB FLOORS the ns->us
        # conversion while Spark's `div` truncates toward zero — they
        # disagree by 1us on pre-epoch (negative) nanos, so spell out
        # floor division with pmod: (ts - pmod(ts, 1000)) div 1000
        # (code-review r8; the test corpus is post-epoch, but the
        # comment claimed floor semantics the code didn't have).
        return df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr("(ts - pmod(ts, 1000)) div 1000")
            ),
        )
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# (applicationId, abs sf_dir, table) -> analyzed base relation.
# Plan/metadata memoization ONLY (guide §6 listing/§7.3 planning cost):
# every `spark.read.parquet` call re-lists the path and re-reads the
# footer for schema inference on the DRIVER — measured 97 ms per call,
# and the query corpus makes hundreds of load_table calls per bench
# pass, so repeated inference was tens of seconds of single-threaded
# driver time per run. The cached object is a lazy, immutable
# DataFrame plan; every action still scans the parquet files — no
# result or data caching is involved (same contract as the catalog's
# cached table relations). Assumes the files under sf_dir are
# immutable for the session lifetime, which is the testdata contract;
# the applicationId key keeps restarted sessions from reusing a dead
# session's plans.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        if name == "events":
            _ensure_nanos_conf(spark)
            df = spark.read.parquet(table_path(sf_dir, name))
            df = normalize_event_ts(df, df.schema["ts"].dataType)
        else:
            df = spark.read.parquet(table_path(sf_dir, name))
        _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
