"""Similarity search: oracle-differential + recall sanity."""

import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match, duck_con


@pytest.mark.parametrize("name", ["cosine_topk", "ann_lsh_topk"])
def test_similarity_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_ann_results_are_subset_of_corpus_and_self_free(spark):
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["ann_lsh_topk"](spark, SF_CORRECTNESS).collect()
    assert rows, "ANN should return some neighbors"
    for r in rows:
        assert r.query_id != r.neighbor_id
        assert 1 <= r.rnk <= 5
        assert -1.0001 <= r.cosine <= 1.0001


def test_ann_recall_against_exact(spark):
    """Bucketed ANN top-1 should agree with exact top-1 for a
    reasonable fraction of queries (same-bucket probability for the
    nearest neighbor is high when cosine is high)."""
    from map_reduce_library_spark.queries import QUERIES

    exact = {
        r.query_id: r.neighbor_id
        for r in QUERIES["cosine_topk"](spark, SF_CORRECTNESS).collect()
        if r.rnk == 1
    }
    ann = {
        r.query_id: r.neighbor_id
        for r in QUERIES["ann_lsh_topk"](spark, SF_CORRECTNESS).collect()
        if r.rnk == 1
    }
    hits = sum(1 for q, n in ann.items() if exact.get(q) == n)
    # This corpus's max cosine is ~0.5 (θ≈60°), so the hyperplane
    # collision probability for the true NN is only (1-θ/π)^4 ≈ 0.2 —
    # expect a handful of agreements, not high recall.
    assert hits >= 1, f"ANN top-1 never matched exact: {hits}/{len(exact)}"

    # Invariant: ANN scores can never exceed the exact best.
    exact_best = {
        r.query_id: r.cosine
        for r in QUERIES["cosine_topk"](spark, SF_CORRECTNESS).collect()
        if r.rnk == 1
    }
    ann_best = {
        r.query_id: r.cosine
        for r in QUERIES["ann_lsh_topk"](spark, SF_CORRECTNESS).collect()
        if r.rnk == 1
    }
    for q, c in ann_best.items():
        assert c <= exact_best[q] + 1e-12


def test_ann_recall_oracle(spark):
    assert_oracle_match(spark, "ann_recall_at_k")


def test_ann_recall_bounds_and_consistency(spark):
    """recall@k in [0,1]; n_hits can never exceed k; and the measured
    recall must agree with a direct set comparison of the two top-k
    queries."""
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["ann_recall_at_k"](spark, SF_CORRECTNESS).collect()
    assert rows
    exact = QUERIES["cosine_topk"](spark, SF_CORRECTNESS).collect()
    ann = QUERIES["ann_lsh_topk"](spark, SF_CORRECTNESS).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    an = {}
    for r in ann:
        an.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_k - r.n_hits / 5.0) < 1e-12
        assert r.n_hits == len(ex[r.query_id] & an.get(r.query_id, set()))


def test_ivf_kmeans_topk_oracle(spark):
    assert_oracle_match(spark, "ivf_kmeans_topk")


def test_ivf_kmeans_recall_oracle(spark):
    assert_oracle_match(spark, "ivf_kmeans_recall_at_k")


def test_kmeans_centroids_shape_and_determinism(spark):
    """The fitted codebook: ≤ N_CENTROIDS cells, full-dim rounded
    coordinates, and bit-identical across two independent fits (the
    6-decimal rounding contract absorbs float-sum wobble)."""
    from map_reduce_library_spark.operators.similarity import (
        kmeans_centroids,
    )
    from map_reduce_library_spark.tables import load_table

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    a = kmeans_centroids(emb, 16, iters=2).collect()
    b = kmeans_centroids(emb, 16, iters=2).collect()
    assert 0 < len(a) <= 16
    for row in a:
        assert len(row.vc) == 64
        for x in row.vc:
            assert x == round(x, 6)
    assert sorted((r.cell, tuple(r.vc)) for r in a) == sorted(
        (r.cell, tuple(r.vc)) for r in b
    )


def test_kmeans_recall_meets_seed_recall(spark):
    """The fitted-codebook IVF must measure at least the seed
    codebook's recall (VERDICT r4 item 5's 'done' bar). Computed via
    the oracles — DuckDB-only, cheap."""
    from map_reduce_library_spark.queries import ORACLES

    con = duck_con(SF_CORRECTNESS)
    fitted = con.execute(
        f"SELECT avg(recall_at_k) FROM ({ORACLES['ivf_kmeans_recall_at_k']})"
    ).fetchone()[0]
    seed = con.execute(
        f"SELECT avg(recall_at_k) FROM ({ORACLES['ivf_recall_at_k']})"
    ).fetchone()[0]
    con.close()
    assert fitted >= seed, f"fitted {fitted} < seed {seed}"


def test_ivf_pq_oracles(spark):
    assert_oracle_match(spark, "ivf_pq_topk")
    assert_oracle_match(spark, "ivf_pq_rerank_topk")
    assert_oracle_match(spark, "ivf_pq_recall_at_k")
    assert_oracle_match(spark, "ivf_pq_rerank_recall_at_k")


def test_ivf_pq_rerank_recall_floor(spark):
    """The stated floor (VERDICT r7 item 6): re-ranked IVF-PQ must
    match the uncompressed multiprobe IVF's recall at the same probe
    width — quantization is end-metric lossless once re-ranked. ADC-
    only recall is also pinned (random uniform vectors are PQ's worst
    case; the gap is exactly what the re-rank exists to close)."""
    from map_reduce_library_spark.queries import QUERIES

    rr = {
        r.query_id: r.recall_at_k
        for r in QUERIES["ivf_pq_rerank_recall_at_k"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    mean_rr = sum(rr.values()) / len(rr)
    assert mean_rr >= 0.80, mean_rr

    adc = {
        r.query_id: r.recall_at_k
        for r in QUERIES["ivf_pq_recall_at_k"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    mean_adc = sum(adc.values()) / len(adc)
    assert 0.15 <= mean_adc <= mean_rr, (mean_adc, mean_rr)


def test_pq_codebooks_shape_and_determinism(spark):
    from map_reduce_library_spark.operators.similarity import (
        PQ_CODES,
        PQ_M,
        pq_codebooks,
        pq_encode,
    )
    from map_reduce_library_spark.tables import load_table

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    cb = pq_codebooks(emb, 64).collect()
    assert len(cb) == PQ_M * PQ_CODES
    assert all(len(r.vc) == 64 // PQ_M for r in cb)
    cb2 = pq_codebooks(emb, 64).collect()
    assert sorted(map(str, cb)) == sorted(map(str, cb2)), "non-deterministic fit"

    codes = pq_encode(emb, pq_codebooks(emb, 64), 64)
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == PQ_M for r in per_vec)
    rng = codes.agg({"code": "min"}).collect()[0][0], codes.agg({"code": "max"}).collect()[0][0]
    assert 0 <= rng[0] and rng[1] < PQ_CODES


def test_semdedup_removals_planted(spark):
    """Planted near-identical vectors in the same cluster: the min-id
    copy survives, every other copy is removed with dup_of pointing at
    a kept lower-id vector; vectors in different clusters are never
    paired even at cosine 1."""
    from map_reduce_library_spark.operators.similarity import (
        semdedup_removals,
    )

    rows = [
        # cluster around +x: ids 0 (seed/keeper), 2, 3 are near-dups
        (0, [1.0, 0.0, 0.05, 0.0]),
        (2, [1.0, 0.01, 0.0, 0.0]),
        (3, [0.99, 0.0, 0.02, 0.0]),
        # cluster around +y: ids 1 (seed), 4 — far from each other
        (1, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.05, 0.8, 0.6, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    got = {
        r.vec_id: r.dup_of
        for r in semdedup_removals(emb, 0.95, n_centroids=2).collect()
    }
    # 2 and 3 duplicate 0 (or each other -> highest-cos lower id);
    # 0 survives; 1 and 4 are below tau so both survive
    assert set(got) == {2, 3}, got
    assert got[2] == 0 and got[3] in (0, 2), got


def test_semdedup_removals_oracle(spark):
    assert_oracle_match(spark, "semdedup_removals")


def test_semdedup_centroid_far_oracle(spark):
    assert_oracle_match(spark, "semdedup_removals_centroid_far")


def test_semdedup_centroid_far_keeper_policy(spark):
    """The paper-exact keeper, pinned on planted vectors: in a
    duplicate group the FARTHEST-from-centroid copy survives (Abbas
    et al. §3), unlike the min-id sibling. Cluster seeded at +x
    (vec 0); vecs 0/2/3 are mutual near-dups; vec 3 is tilted
    farthest from the fitted centroid, so it must be the survivor —
    under min-id the survivor is 0."""
    from map_reduce_library_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_removals,
        semdedup_removals_centroid_far,
    )

    rows = [
        (0, [1.0, 0.0, 0.05, 0.0]),
        (2, [1.0, 0.01, 0.0, 0.0]),
        (3, [0.97, 0.0, 0.26, 0.0]),   # same dup group, most tilted
        (1, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.05, 0.8, 0.6, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cents = kmeans_centroids(emb, 2).localCheckpoint(eager=True)
    far = {
        r.vec_id: r.dup_of
        for r in semdedup_removals_centroid_far(
            emb, 0.95, centroids=cents, n_centroids=2
        ).collect()
    }
    minid = {
        r.vec_id: r.dup_of
        for r in semdedup_removals(
            emb, 0.95, n_centroids=2, centroids=cents
        ).collect()
    }
    # min-id keeps 0; paper policy keeps 3 (farthest from centroid)
    assert set(minid) == {2, 3}, minid
    assert set(far) == {0, 2}, far
    # dup_of is chain evidence (highest-cosine higher-ranked member,
    # itself possibly removed); following the chain ends at keeper 3
    assert far[2] == 3 and far[0] in (2, 3), far


def test_semdedup_pair_recall_beats_hyperplane_lsh(spark):
    """The SemDeDup claim MEASURED (same discipline as
    emb_dedup_recall for the LSH path): at the same tau, within-
    learned-cluster pair discovery recovers 18/59 = 0.305 of the
    exact all-pairs ground truth at sf0.01 — above the hyperplane-LSH
    production path's measured 0.22 — because k-means blocking
    follows the data's density. Deterministic (fixed testdata, seeded
    Lloyd fit), so the floor is pinned at the measured value."""
    from map_reduce_library_spark.operators.similarity import (
        semdedup_pairs,
    )
    from map_reduce_library_spark.querydefs.dedup import (
        shared_exact_emb_pairs,
    )
    from map_reduce_library_spark.querydefs.similarity import (
        KMEANS_N_PROBE,
        SEMDEDUP_TAU,
        shared_ivf_assigned,
    )
    from pyspark.sql import functions as F

    exact = shared_exact_emb_pairs(spark, SF_CORRECTNESS).select(
        "vec_a", "vec_b"
    )
    pairs = semdedup_pairs(
        shared_ivf_assigned(
            spark, SF_CORRECTNESS, n_probe=KMEANS_N_PROBE, fitted=True
        ),
        SEMDEDUP_TAU,
    ).select(F.col("keep_id").alias("pa"), F.col("rm_id").alias("pb"))
    n_exact = exact.count()
    hits = exact.join(
        pairs, (exact.vec_a == pairs.pa) & (exact.vec_b == pairs.pb)
    ).count()
    assert n_exact > 0
    assert hits / n_exact >= 0.30, (hits, n_exact)
