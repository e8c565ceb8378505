"""Count-Min sketch: oracle differential + the sketch laws
(one-sided error, bounded state, cell-wise mergeability)."""

from __future__ import annotations

from conftest import SF_CORRECTNESS, assert_oracle_match
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.cms import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_lookup,
)
from map_reduce_library_spark.queries import QUERIES


def _tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.explode(F.split("text", " ", -1)).alias("token"))


def test_cms_frequency_estimates_oracle(spark):
    assert_oracle_match(spark, "cms_frequency_estimates")


def test_cms_never_undercounts_any_token(spark):
    """One-sided error on EVERY distinct token, not just the probed
    top-k: est >= exact is the CMS contract."""
    tok = _tokens(spark, SF_CORRECTNESS)
    cms = cms_build(tok, "token")
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_lookup(cms, exact.select("token"), "token")
    bad = exact.join(est, "token").where(
        F.col("est_n") < F.col("exact_n")
    )
    assert bad.count() == 0


def test_cms_state_is_bounded(spark):
    cms = cms_build(_tokens(spark, SF_CORRECTNESS), "token")
    assert cms.count() <= CMS_D * CMS_W
    # every row of the sketch belongs to exactly one hash row
    assert cms.select("j").distinct().count() == CMS_D


def test_cms_merges_cellwise(spark):
    """Sketch(A ∪ B) == cellwise-sum(Sketch(A), Sketch(B)) — the
    property that lets per-shard/per-day sketches roll up without
    touching raw data (the hll_sketch_rollup_daily pattern, exact)."""
    tok = _tokens(spark, SF_CORRECTNESS).withColumn(
        "half", F.length("token") % 2
    )
    whole = cms_build(tok, "token")
    merged = (
        cms_build(tok.where(F.col("half") == 0), "token")
        .unionByName(cms_build(tok.where(F.col("half") == 1), "token"))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = whole.unionByName(
        merged.select("j", "bucket", (-F.col("cnt")).alias("cnt"))
    ).groupBy("j", "bucket").agg(F.sum("cnt").alias("d")).where(
        F.col("d") != 0
    )
    assert diff.count() == 0


def test_cms_plan_has_broadcast_probe_join(spark):
    plan = (
        QUERIES["cms_frequency_estimates"](spark, SF_CORRECTNESS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_cms_honors_custom_width_and_skips_nulls(spark):
    """code-review r8 (verified): w was silently pinned to CMS_W in
    the bucket expression, and NULL items produced unmatchable
    null-bucket cells breaking the est >= exact guarantee."""
    from map_reduce_library_spark.operators.cms import (
        cms_build,
        cms_lookup,
    )

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [(None,)] * 2, "tok string"
    )
    sketch = cms_build(df, "tok", w=8)
    assert sketch.agg({"bucket": "max"}).first()[0] < 8
    # null items contribute no cells
    assert sketch.where("bucket IS NULL").count() == 0
    items = spark.createDataFrame([("a",), ("b",)], "tok string")
    est = {
        r.tok: r.est_n
        for r in cms_lookup(sketch, items, "tok", w=8).collect()
    }
    assert est["a"] >= 5 and est["b"] >= 3  # one-sided guarantee
