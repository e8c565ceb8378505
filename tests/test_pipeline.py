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
