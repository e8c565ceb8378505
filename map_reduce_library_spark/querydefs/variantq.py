"""Spark 4 VARIANT: open-schema semi-structured ingestion.

``json_extract_props`` (querydefs/relational5.py) covers per-access
string JSON parsing (``get_json_object``); these queries cover the
Spark-4-native path: parse ONCE into the binary VARIANT encoding, then
typed path access (``variant_get`` / ``try_variant_get``). At 100 TB
the difference is material — a VARIANT column parses each document a
single time at ingest (and shreds into columnar storage under Parquet
variant shredding), where string-JSON re-parses per extraction
expression per row.

Extension operators — the reference has no semi-structured types at
all (SURVEY.md §1.2: keys are opaque ordered objects, values fully
opaque). Oracles pin the JSON-path semantics cross-engine via DuckDB's
json_extract on the same documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


@register(
    "variant_typed_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           CAST(COUNT(*) FILTER (
             WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
           ) AS BIGINT) AS n_k_ge_50,
           CAST(COUNT(*) FILTER (
             WHERE json_extract_string(props, '$.absent') IS NULL
           ) AS BIGINT) AS n_absent_null
    FROM events
    GROUP BY event_type
    """,
)
def variant_typed_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse ``events.props`` into VARIANT once, then aggregate typed
    path extractions per event type: exact integer sum/max of ``$.k``,
    a predicate on the extracted value, and the missing-path -> NULL
    contract (``try_variant_get`` of an absent field), which both
    engines must agree is NULL for every row.

    All outputs are exact integers — no float-ordering hazard. The
    plan is a single scan + one grouped aggregate; parse_json runs in
    the JVM expression engine (no Python)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "bigint")
    absent = F.try_variant_get("v", "$.absent", "string")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count_if(k >= 50).alias("n_k_ge_50"),
        F.count_if(absent.isNull()).alias("n_absent_null"),
    )


@register(
    "variant_nested_paths",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             json_object(
               'cust', json_object('key', o_custkey),
               'tags', json_array(o_orderpriority, o_orderstatus)
             ) AS doc
      FROM orders
      WHERE o_orderkey % 7 = 0
    )
    SELECT o_orderkey,
           CAST(json_extract_string(doc, '$.cust.key') AS BIGINT)
             AS cust_key,
           json_extract_string(doc, '$.tags[0]') AS tag0,
           json_extract_string(doc, '$.tags[1]') AS tag1,
           json_extract_string(doc, '$.tags[9]') AS tag_oob
    FROM j
    """,
)
def variant_nested_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-object and array-index VARIANT paths, pinned cross-
    engine: build a nested JSON document from ``orders`` columns
    (to_json of a struct — the corpus has no nested JSON of its own),
    parse to VARIANT, and extract ``$.cust.key`` (object chain),
    ``$.tags[0]``/``$.tags[1]`` (array index), and an out-of-bounds
    index that must be NULL. Everything is a scan-side projection —
    zero shuffles; the mod-7 filter just bounds the driver compare."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 7 == 0
    )
    doc = F.to_json(
        F.struct(
            F.struct(F.col("o_custkey").alias("key")).alias("cust"),
            F.array("o_orderpriority", "o_orderstatus").alias("tags"),
        )
    )
    v = F.parse_json(doc)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.cust.key", "bigint").alias("cust_key"),
        F.variant_get(v, "$.tags[0]", "string").alias("tag0"),
        F.variant_get(v, "$.tags[1]", "string").alias("tag1"),
        F.try_variant_get(v, "$.tags[9]", "string").alias("tag_oob"),
    )
