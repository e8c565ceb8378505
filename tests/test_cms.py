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
    from map_reduce_library_spark.operators.cms import cms_merge

    whole = cms_build(tok, "token")
    merged = cms_merge(
        cms_build(tok.where(F.col("half") == 0), "token"),
        cms_build(tok.where(F.col("half") == 1), "token"),
    )
    diff = whole.unionByName(
        merged.withColumn("cnt", -F.col("cnt"))
    ).groupBy("j", "bucket").agg(F.sum("cnt").alias("delta")).where(
        F.col("delta") != 0
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


def test_cms_lookup_rejects_geometry_mismatch(spark):
    """ADVICE r9: a sketch built with one (d, w) probed at another
    used to return silently wrong estimates that can break the
    est >= exact one-sided contract. The sketch now carries its own
    geometry and a mismatched probe fails the job loudly."""
    import pytest

    from map_reduce_library_spark.operators.cms import (
        cms_build,
        cms_lookup,
        cms_merge,
    )

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, "tok string")
    items = spark.createDataFrame([("a",), ("b",)], "tok string")
    sketch = cms_build(df, "tok", w=1024)

    with pytest.raises(Exception, match="geometry mismatch"):
        cms_lookup(sketch, items, "tok").collect()  # default CMS_W
    with pytest.raises(Exception, match="geometry mismatch"):
        cms_lookup(sketch, items, "tok", d=2, w=1024).collect()

    # matching geometry still answers with the one-sided guarantee
    est = {
        r.tok: r.est_n
        for r in cms_lookup(sketch, items, "tok", w=1024).collect()
    }
    assert est["a"] >= 5 and est["b"] >= 3

    # a mixed-geometry merge is meaningless: the merged relation keeps
    # both geometry records and ANY probe of it must fail
    mixed = cms_merge(sketch, cms_build(df, "tok", w=8))
    with pytest.raises(Exception, match="geometry mismatch"):
        cms_lookup(mixed, items, "tok", w=1024).collect()


def test_cms_lookup_legacy_sketch_without_geometry_still_probes(spark):
    """A pre-r9 persisted sketch (no d/w columns) keeps the old
    un-validated behavior rather than failing to probe at all."""
    from map_reduce_library_spark.operators.cms import (
        cms_build,
        cms_lookup,
    )

    df = spark.createDataFrame([("a",)] * 4, "tok string")
    legacy = cms_build(df, "tok", w=64).drop("d", "w")
    items = spark.createDataFrame([("a",)], "tok string")
    est = {
        r.tok: r.est_n
        for r in cms_lookup(legacy, items, "tok", w=64).collect()
    }
    assert est["a"] >= 4
