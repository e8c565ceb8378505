"""Observation-based pipeline metrics (zero-extra-pass accounting)."""

from conftest import SF_SMOKE


def test_observe_metrics_zero_extra_pass(spark):
    """Metrics arrive as a side effect of the one action; values match
    a direct aggregation."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.pipeline import (
        quality_gate_metrics,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    observed, obs = quality_gate_metrics(docs)
    n = observed.count()  # the single action
    got = obs.get
    assert got["rows"] == n
    direct = docs.agg(
        F.sum((F.col("text").isNull() | (F.length("text") == 0)).cast("long")),
        F.avg(F.length("text")),
    ).collect()[0]
    assert got["null_or_empty"] == (direct[0] or 0)
    assert abs(got["mean_chars"] - direct[1]) < 1e-9
