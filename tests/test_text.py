"""Text analysis: oracle-differential + semantic checks."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match

TEXT_QUERIES = [
    "text_stats",
    "lang_id",
    "token_counts",
    "doc_fingerprints",
    "pii_redaction",
    "source_lang_mix",
]


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_quality_score_in_unit_interval(spark):
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["text_stats"](spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.n_distinct <= r.n_tokens


def test_bag_fingerprint_order_invariant(spark):
    from map_reduce_library_spark.operators.text import doc_fingerprints

    df = spark.createDataFrame(
        [(1, "b a c"), (2, "a b c"), (3, "a b d")], ["doc_id", "text"]
    )
    fps = {r.doc_id: (r.fp_exact, r.fp_bag) for r in doc_fingerprints(df).collect()}
    assert fps[1][0] != fps[2][0]  # exact differs
    assert fps[1][1] == fps[2][1]  # bag identical
    assert fps[1][1] != fps[3][1]  # different content differs


def test_repetition_stats_oracle(spark):
    assert_oracle_match(spark, "repetition_stats")


def test_repetition_stats_semantics(spark):
    rows = {
        r.doc_id: r
        for r in __import__("map_reduce_library_spark.queries", fromlist=["QUERIES"])
        .QUERIES["repetition_stats"](spark, SF_CORRECTNESS)
        .collect()
    }
    for r in rows.values():
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 < r.top_token_ratio <= 1.0
        assert 0.0 <= r.dup_3gram_ratio <= 1.0
        # mode dominance can never be below uniform share
        assert r.top_token_ratio >= 1.0 / r.n_tokens - 1e-12


def test_quality_filter_oracle(spark):
    assert_oracle_match(spark, "quality_filter_docs")


def test_quality_filter_keep_iff_no_reasons(spark):
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["quality_filter_docs"](spark, SF_CORRECTNESS).collect()
    assert rows
    kept = [r for r in rows if r.keep]
    assert kept, "some sf0.01 documents should pass the filter"
    for r in rows:
        assert r.keep == (r.fail_reasons == "")
