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


def test_bm25_oracle(spark):
    assert_oracle_match(spark, "bm25_topk_docs")


def test_bm25_semantics(spark):
    """Higher tf of a rarer term must outrank lower tf of it, all
    else equal; docs without any query term never appear."""
    from map_reduce_library_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "rare common common filler filler"),
            (2, "rare rare common filler filler"),
            (3, "common filler filler filler filler"),
            (4, "filler filler filler filler filler"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, ("rare", "common"), top_k=10).collect()
    by_id = {r.doc_id: r for r in rows}
    assert 4 not in by_id  # no query term -> not retrieved
    assert by_id[2].bm25 > by_id[1].bm25 > by_id[3].bm25
    assert by_id[1].n_hit_terms == 2 and by_id[3].n_hit_terms == 1


def test_bm25_topk_cut_is_deterministic(spark):
    """The k-cut orders by the ROUNDED score then doc_id, so ties at
    the boundary resolve identically in Spark and the oracle."""
    from map_reduce_library_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "term filler") for i in range(6)], ["doc_id", "text"]
    )
    rows = bm25_topk(df, ("term",), top_k=3).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]  # identical scores -> id order


def test_null_text_gets_no_quality_score_and_und_lang(spark):
    """code-review r8 (verified bugs): least() skips NULL args, so a
    null-text doc used to score a PERFECT 1.0; and the lang argmax
    over all-NULL scores used to return 'fr'. Null text must yield
    NULL score, 'und' language, and an explicit 'null' fail reason."""
    from map_reduce_library_spark.operators.text import (
        lang_id,
        quality_filter,
        text_stats,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "the of and to a in is it you that " * 5)],
        "doc_id bigint, text string",
    )
    stats = {r.doc_id: r for r in text_stats(df).collect()}
    assert stats[1].quality_score is None
    assert stats[2].quality_score is not None

    langs = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert langs[1] == "und"
    assert langs[2] == "en"

    qf = {r.doc_id: r for r in quality_filter(df).collect()}
    assert not qf[1].keep
    assert "null" in qf[1].fail_reasons.split(",")
