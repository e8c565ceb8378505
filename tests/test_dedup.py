"""Dedup suite: oracle-differential + semantic sanity checks."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match

DEDUP_QUERIES = [
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_capped",
    "lsh_hot_buckets_audit",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "embedding_cosine_dups",
    "dedup_rate_by_source",
    "near_dup_rate_by_source",
]


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_dedup_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_lsh_recall_of_high_jaccard_pairs(spark):
    """LSH candidates must contain (essentially) every true near-dup:
    with 4 bands of 3 rows, P(miss | jaccard=0.9) ≈ (1-0.9³)⁴ ≈ 0.5%.
    The planted near-dups in the corpus are jaccard ≥ 0.9."""
    from map_reduce_library_spark.queries import QUERIES

    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["minhash_lsh_pairs"](spark, SF_CORRECTNESS).collect()
    }
    true_dups = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["ngram_jaccard_pairs"](spark, SF_CORRECTNESS).collect()
        if r.jaccard >= 0.9
    }
    assert true_dups, "corpus should contain planted near-dups"
    missed = true_dups - lsh
    assert len(missed) <= max(1, len(true_dups) // 10), (
        f"LSH missed too many true near-dups: {missed}"
    )


@pytest.mark.parametrize(
    "name", ["dedup_clusters_wide", "dedup_keep_best_wide"]
)
def test_wide_graph_family_oracle(spark, name):
    """The dedup-graph family at the PRODUCTION K=128 / 16×8 geometry
    (VERDICT r8 item 2) matches its recursive-CTE oracle."""
    assert_oracle_match(spark, name)


def test_wide_graph_keeps_high_jaccard_dups_and_differs_from_narrow(spark):
    """Two properties of the wide candidate graph: (a) planted
    near-dups (Jaccard ≥ 0.9; per-band collision 0.9⁸ ≈ 0.43, miss
    all 16 bands ≈ 1.2e-4) are still co-clustered — the precision
    gain of the 16×8 knee costs essentially no true-dup recall; (b)
    the wide cluster assignment genuinely differs from the K=12 demo
    graph's (otherwise the geometry knob changes nothing and the
    query is padding)."""
    from map_reduce_library_spark.queries import QUERIES

    wide = {
        (r.doc_id, r.cluster_id)
        for r in QUERIES["dedup_clusters_wide"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    narrow = {
        (r.doc_id, r.cluster_id)
        for r in QUERIES["dedup_clusters"](spark, SF_CORRECTNESS).collect()
    }
    assert wide != narrow, "wide geometry must change the cluster graph"

    true_dups = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["ngram_jaccard_pairs"](
            spark, SF_CORRECTNESS
        ).collect()
        if r.jaccard >= 0.9
    ]
    assert true_dups, "corpus should contain planted near-dups"
    clustered = dict(wide)
    split = [
        (a, b)
        for a, b in true_dups
        if clustered.get(a) != clustered.get(b) or clustered.get(a) is None
    ]
    assert len(split) <= max(1, len(true_dups) // 10), (
        f"wide graph split too many true near-dup pairs: {split}"
    )


def test_simhash_near_dups_have_close_fingerprints(spark):
    """Near-identical docs should differ in few SimHash bits (60-bit
    bigint fingerprints; hamming = popcount of xor)."""
    from map_reduce_library_spark.queries import QUERIES

    sh = {
        r.doc_id: r.simhash
        for r in QUERIES["simhash_fingerprint"](spark, SF_CORRECTNESS).collect()
    }
    dups = QUERIES["ngram_jaccard_pairs"](spark, SF_CORRECTNESS).collect()
    high = [(r.doc_a, r.doc_b) for r in dups if r.jaccard >= 0.95]
    assert high
    for a, b in high:
        ham = bin(sh[a] ^ sh[b]).count("1")
        assert ham <= 11, f"docs {a},{b} jaccard>=0.95 but hamming {ham}"


def test_embedding_lsh_oracle(spark):
    assert_oracle_match(spark, "embedding_cosine_dups_lsh")


def test_embedding_lsh_subset_of_ground_truth(spark):
    """The bucketed production variant must return a SUBSET of the
    all-pairs ground truth with identical cosines on shared pairs —
    LSH only prunes candidates, never invents or perturbs them."""
    from map_reduce_library_spark.queries import QUERIES

    truth = {
        (r.vec_a, r.vec_b): r.cosine
        for r in QUERIES["embedding_cosine_dups"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in QUERIES["embedding_cosine_dups_lsh"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    assert set(lsh) <= set(truth)
    for pair, cos in lsh.items():
        assert abs(cos - truth[pair]) < 1e-9
    # and the buckets must actually find a nontrivial share of dups
    assert len(lsh) >= len(truth) // 100


def test_simhash_hamming_oracle(spark):
    assert_oracle_match(spark, "simhash_hamming_dups")


def test_simhash_hamming_banded_retrieval_is_exact(spark):
    """Pigeonhole guarantee: banding must find EVERY pair within
    hamming <= bands-1, not a recall-limited subset — compare against
    brute force over the wide integer fingerprints."""
    from map_reduce_library_spark.operators.dedup import simhash_wide
    from map_reduce_library_spark.queries import QUERIES
    from map_reduce_library_spark.tables import load_table

    sh = {
        r.doc_id: r.sh
        for r in simhash_wide(
            load_table(spark, SF_CORRECTNESS, "documents")
        ).collect()
    }
    ids = sorted(sh)
    brute = sorted(
        (a, b, h)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        for h in [bin(sh[a] ^ sh[b]).count("1")]
        if h <= 3
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["simhash_hamming_dups"](spark, SF_CORRECTNESS).collect()
    )
    assert brute, "corpus should contain simhash near-dups"
    assert got == brute


def test_emb_dedup_recall_oracle(spark):
    assert_oracle_match(spark, "emb_dedup_recall")


def test_emb_dedup_recall_bounds(spark):
    from map_reduce_library_spark.queries import QUERIES

    row = QUERIES["emb_dedup_recall"](spark, SF_CORRECTNESS).collect()[0]
    assert row.n_exact > 0, "ground truth should contain dup pairs"
    assert 0.0 <= row.recall <= 1.0
    assert row.n_hits <= row.n_exact
