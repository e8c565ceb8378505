"""Small-file compaction + snapshot upsert + ORC round-trip."""

from pyspark.sql import functions as F

from conftest import SF_CORRECTNESS, SF_SMOKE

from map_reduce_library_spark.operators.maintenance import (
    compact_parquet,
    snapshot_upsert,
)
from map_reduce_library_spark.sources.readers import write_read_orc
from map_reduce_library_spark.tables import load_table


def test_compaction_reduces_file_count_losslessly(spark, tmp_path):
    src = str(tmp_path / "many")
    dst = str(tmp_path / "compact")
    orders = load_table(spark, SF_CORRECTNESS, "orders")
    orders.repartition(64).write.parquet(src)  # simulate small-file ingest
    n_small = len(spark.read.parquet(src).inputFiles())
    assert n_small >= 64

    got = compact_parquet(spark, src, dst, target_file_bytes=10**9)
    assert len(got.inputFiles()) < n_small
    assert got.count() == orders.count()
    assert got.exceptAll(orders).count() == 0


def test_snapshot_upsert_merge_semantics(spark):
    base = load_table(spark, SF_SMOKE, "orders")
    # Updates: modify 10 existing orders (zero their price) + insert 5 new.
    changed = base.orderBy("o_orderkey").limit(10).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    inserted = base.orderBy(F.col("o_orderkey").desc()).limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    updates = changed.unionByName(inserted)

    merged = snapshot_upsert(base, updates, ["o_orderkey"])
    assert merged.count() == base.count() + 5
    # The 10 matched keys carry the update's values now.
    zeroed = merged.join(
        changed.select("o_orderkey"), "o_orderkey"
    ).where(F.col("o_totalprice") == 0.0)
    assert zeroed.count() == 10
    # Keys are still unique after the merge.
    assert merged.select("o_orderkey").distinct().count() == merged.count()


def test_orc_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "nation")
    got = write_read_orc(df, str(tmp_path / "orc"))
    assert got.schema == df.schema
    assert got.exceptAll(df).count() == 0
