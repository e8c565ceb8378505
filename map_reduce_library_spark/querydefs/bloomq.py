"""Bloom-filter join pruning, driver-checked.

Semantic-transparency oracle (the ``skew_salted_join`` pattern): the
oracle is the PLAIN join+aggregate — Bloom pruning followed by the
exact join must return byte-identical results because Bloom filters
admit false positives only, never false negatives. The pruning is a
physical-plan strategy, invisible in the answer; what the driver
verifies is exactly that invisibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.bloom import bloom_build, bloom_prune
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

# The build-side predicate keeps ~1/5 of parts, so the Bloom signature
# rejects ~80% of lineitem before the join shuffle.
MIN_PART_SIZE = 40


@register(
    "bloom_pruned_part_revenue",
    oracle=f"""
    SELECT p_brand AS brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= {MIN_PART_SIZE}
    GROUP BY brand
    """,
)
def bloom_pruned_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by brand for large parts, with the lineitem probe side
    Bloom-pruned before the join shuffle.

    Scale story: at 100 TB the filtered ``part`` side can be tens of
    millions of keys — too big for a broadcast hash join, so the join
    shuffles BOTH sides; a ~45 MB Bloom signature of the filtered keys
    still broadcasts and drops ~80% of the fact scan's rows inside
    whole-stage codegen before they ever reach an exchange. The exact
    join that follows clears false positives, so the answer equals the
    plain join (the oracle). Locally AQE happens to broadcast the
    small exact side too — the pruning plumbing is identical either
    way and is pinned by tests/test_bloom.py.
    """
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size") >= MIN_PART_SIZE
    )
    build_keys = part.select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pruned = bloom_prune(li, bloom_build(build_keys, "p_partkey"), "l_partkey")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        pruned.join(
            part.select("p_partkey", "p_brand"),
            pruned.l_partkey == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
