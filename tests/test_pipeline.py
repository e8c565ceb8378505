"""Pipeline data-prep: oracle-differential + stability semantics."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match

PIPE_QUERIES = [
    "deterministic_split_counts",
    "stratified_sample_docs",
    "sequence_packing",
]


@pytest.mark.parametrize("name", PIPE_QUERIES)
def test_pipeline_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_split_is_stable_under_subsetting(spark):
    """Adding/removing other rows must not change a doc's split —
    the re-run-safety property rand() cannot give."""
    from map_reduce_library_spark.operators.pipeline import deterministic_split
    from map_reduce_library_spark.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    full = {
        r.doc_id: r.split for r in deterministic_split(docs).collect()
    }
    subset = {
        r.doc_id: r.split
        for r in deterministic_split(docs.where("doc_id % 3 = 0")).collect()
    }
    assert subset == {k: v for k, v in full.items() if k % 3 == 0}


def test_packing_bins_respect_budget_start_rule(spark):
    from map_reduce_library_spark.operators.pipeline import pack_sequences
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 1000), (2, 1000), (3, 1000), (4, 100)], "doc_id long, n long"
    )
    out = {r.doc_id: r.seq_bin for r in pack_sequences(df, "n", 2048).collect()}
    # doc1 starts at 0 → bin0; doc2 starts at 1000 → bin0;
    # doc3 starts at 2000 → bin0 (start rule); doc4 at 3000 → bin1.
    assert out == {1: 0, 2: 0, 3: 0, 4: 1}


@pytest.mark.parametrize("name", ["vocab_oov_rate", "temperature_mix"])
def test_vocab_mix_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_temperature_mix_upsamples_low_resource(spark):
    """alpha<1 must give low-resource classes a larger weight than
    their raw share, high-resource a smaller one; weights sum to 1."""
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["temperature_mix"](spark, SF_CORRECTNESS).collect()
    total = sum(r.n_docs for r in rows)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6
    for r in rows:
        share = r.n_docs / total
        if share < 1.0 / len(rows):
            assert r.weight > share, (r.lang, r.weight, share)
        elif share > 1.0 / len(rows):
            assert r.weight < share, (r.lang, r.weight, share)


def test_oov_rate_bounds_and_vocab_coverage(spark):
    """OOV rate in [0,1]; a vocab as large as the whole token set
    would drive every rate to 0 — with top-1000 the corpus-weighted
    mean OOV must be below the unweighted tail share."""
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["vocab_oov_rate"](spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.n_oov <= r.n_tokens


def test_chunk_level_dedup_oracle(spark):
    assert_oracle_match(spark, "chunk_level_dedup")


def test_chunk_level_dedup_catches_cross_doc_repeats(spark):
    """Every reported chunk hash must occur in >=2 rows of the raw
    chunk-hash relation, and exact-duplicate documents must surface."""
    from map_reduce_library_spark.operators.pipeline import chunk_hashes
    from map_reduce_library_spark.queries import QUERIES
    from map_reduce_library_spark.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    dup_rows = QUERIES["chunk_level_dedup"](spark, SF_CORRECTNESS).collect()
    assert dup_rows
    raw = chunk_hashes(docs, 64, 48)
    counts = {
        r.chunk_hash: r.n
        for r in raw.groupBy("chunk_hash").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for r in dup_rows:
        assert counts[r.chunk_hash] == r.n_copies >= 2


def test_sequence_packing_efficiency_oracle(spark):
    from tests.conftest import assert_oracle_match

    assert_oracle_match(spark, "sequence_packing_efficiency")


def test_packing_efficiency_consistent_with_bins(spark):
    """n_bins equals the distinct bins sequence_packing reports, and
    token mass is conserved: avg_fill * n_bins * budget == the lang's
    total tokens (avg-of-exact-dyadic-ratios identity). Interior bins
    may legitimately sit under budget — a doc that overflows bin k
    spills INTO bin k+1's address range without contributing to its
    fill — so no per-bin floor is asserted."""
    from map_reduce_library_spark.queries import QUERIES
    from map_reduce_library_spark.querydefs.pipeline import PACK_BUDGET
    from tests.conftest import SF_SMOKE

    from pyspark.sql import functions as F

    eff = {
        r.lang: (r.n_bins, r.avg_fill, r.n_full)
        for r in QUERIES["sequence_packing_efficiency"](
            spark, SF_SMOKE
        ).collect()
    }
    per_lang = (
        QUERIES["sequence_packing"](spark, SF_SMOKE)
        .groupBy("lang")
        .agg(
            F.countDistinct("seq_bin").alias("n"),
            F.sum("tokens").alias("total_tokens"),
        )
    )
    for r in per_lang.collect():
        n_bins, avg_fill, n_full = eff[r.lang]
        assert n_bins == r.n
        assert 0 <= n_full <= n_bins
        assert (
            abs(avg_fill * n_bins * PACK_BUDGET - r.total_tokens)
            < 0.5 * n_bins
        ), f"{r.lang}: avg_fill inconsistent with token mass"
