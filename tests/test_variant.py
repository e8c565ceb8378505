"""Spark 4 VARIANT queries: oracle differentials + the typed-access
contracts (missing path -> NULL, array OOB -> NULL, JVM-side parse)."""

from __future__ import annotations

from conftest import SF_CORRECTNESS, assert_oracle_match
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import QUERIES


def test_variant_typed_extraction_oracle(spark):
    assert_oracle_match(spark, "variant_typed_extraction")


def test_variant_nested_paths_oracle(spark):
    assert_oracle_match(spark, "variant_nested_paths")


def test_variant_missing_path_is_null_for_all_rows(spark):
    """try_variant_get of an absent field is NULL on every row — the
    open-schema contract (absent != error)."""
    rows = QUERIES["variant_typed_extraction"](
        spark, SF_CORRECTNESS
    ).collect()
    assert rows
    for r in rows:
        assert r.n_absent_null == r.n


def test_variant_array_oob_is_null(spark):
    rows = QUERIES["variant_nested_paths"](spark, SF_CORRECTNESS).collect()
    assert rows
    assert all(r.tag_oob is None for r in rows)
    assert all(r.tag0 is not None and r.tag1 is not None for r in rows)


def test_variant_parse_stays_jvm_side(spark):
    """parse_json/variant_get are JVM expressions: no Python in the
    plan, single scan, no shuffle for the projection query."""
    plan = (
        QUERIES["variant_nested_paths"](spark, SF_CORRECTNESS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure scan-side projection


def test_variant_get_strict_vs_try(spark):
    """variant_get on a type-mismatched cast raises; try_variant_get
    returns NULL — the ANSI/try pairing the corpus pins for casts
    (try_cast_gauntlet) extended to variant access."""
    df = spark.sql(
        "SELECT parse_json('{\"s\": \"not-a-number\"}') AS v"
    )
    ok = df.select(
        F.try_variant_get("v", "$.s", "bigint").alias("x")
    ).collect()
    assert ok[0].x is None
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises(PySparkException):
        df.select(F.variant_get("v", "$.s", "bigint").alias("x")).collect()
