"""Dedup part 2: LSH-restricted Jaccard, clusters, IVF, TF-IDF."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match


@pytest.mark.parametrize(
    "name",
    ["ngram_jaccard_lsh", "dedup_clusters", "ivf_ann_topk", "tfidf_top_terms"],
)
def test_dedup2_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_clusters_are_consistent_with_pairs(spark):
    from map_reduce_library_spark.queries import QUERIES

    pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["minhash_lsh_pairs"](spark, SF_CORRECTNESS).collect()
    ]
    clusters = {
        r.doc_id: r.cluster_id
        for r in QUERIES["dedup_clusters"](spark, SF_CORRECTNESS).collect()
    }
    for a, b in pairs:
        assert clusters[a] == clusters[b], (a, b)
    for node, label in clusters.items():
        assert label <= node  # min-id representative
