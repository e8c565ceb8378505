"""Driver-checked query over the table-maintenance MERGE operator.

``operators/maintenance.py::snapshot_upsert`` had only pytest
coverage (COVERAGE.md listed the maintenance row test-only); this
registers its semantics against a DuckDB oracle that states MERGE
the relational way — base ANTI JOIN delta keys, UNION ALL delta —
so the operator's update/insert behavior is hash-verified by the
driver like every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.maintenance import snapshot_upsert
from map_reduce_library_spark.operators.pipeline import hash_bucket
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

# DuckDB twin of hash_bucket(o_orderkey, 100, ':upsert').
_UPSERT_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':upsert'), 1, 15))"
    "::BIGINT % 100)"
)
_INSERT_KEY_OFFSET = 1_000_000_000


@register(
    "snapshot_upsert_merge",
    oracle=f"""
    WITH delta AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE {_UPSERT_BUCKET_SQL} < 10
      UNION ALL
      SELECT o_orderkey + {_INSERT_KEY_OFFSET}, o_custkey, 'N',
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders
      WHERE {_UPSERT_BUCKET_SQL} >= 10 AND {_UPSERT_BUCKET_SQL} < 12
    ), merged AS (
      SELECT b.* FROM orders b
      ANTI JOIN delta d ON b.o_orderkey = d.o_orderkey
      UNION ALL
      SELECT * FROM delta
    )
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM merged GROUP BY 1
    """,
)
def snapshot_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE on plain DataFrames, driver-verified: a deterministic
    10%-of-keys update slice (status flipped to 'U', price bumped —
    exact in double) plus a 2% insert slice under shifted keys
    (status 'N'), applied with ``snapshot_upsert`` and rolled up by
    status. The oracle restates MERGE relationally (anti join +
    union), so representative survival, update visibility, and
    insert arrival are all value-hashed. ``validate=False`` because
    the delta is key-unique by construction — this is the ADVICE-r6
    escape hatch on its intended path: the whole merge stays ONE
    lazy plan (base scanned once, never shuffled; delta keys
    broadcast into the anti join). Sum as DECIMAL so the total is
    partition-order-independent."""
    orders = load_table(spark, sf_dir, "orders")
    b = hash_bucket("o_orderkey", 100, ":upsert")
    updates = (
        orders.where(b < 10)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    inserts = (
        orders.where((b >= 10) & (b < 12))
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(_INSERT_KEY_OFFSET)
        )
        .withColumn("o_orderstatus", F.lit("N"))
    )
    delta = updates.unionByName(inserts)
    merged = snapshot_upsert(
        orders, delta, ["o_orderkey"], validate=False
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
