"""Empirical S-curve for the production-width MinHash geometry
(VERDICT r7 item 1): detection probability vs true Jaccard.

Theory: a pair with Jaccard J agrees on one fixed band of r rows with
probability J^r, so LSH with b bands detects it with
P(J) = 1 - (1 - J^r)^b. For the wide geometry (b=16, r=8) the knee
sits at t = (1/16)^(1/8) ~= 0.71:

    J    : 0.3      0.5     0.7    0.9
    P(J) : 0.002    0.061   0.61   0.9999

The test plants doc pairs with EXACT shingle-set Jaccard (m shared +
d per-side distinct shingles -> J = m/(m+2d)), runs the real
signature -> bands -> candidate-pairs pipeline, and checks the
measured detection rate per level sits in the theory-derived window.
Everything is md5-deterministic — no RNG, no flake: the measured
curve is a fixed function of the planted shingle strings.
"""

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.dedup import (
    LSH_BANDS_WIDE,
    LSH_ROWS_WIDE,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signature,
)

# (jaccard, m_shared, d_per_side): J = m / (m + 2d)
LEVELS = [
    (0.9, 36, 2),
    (0.7, 14, 3),
    (0.5, 10, 5),
    (0.3, 6, 7),
]
PAIRS_PER_LEVEL = 40


def _planted_shingles(spark):
    rows = []
    doc = 0
    truth = {}  # (doc_a, doc_b) -> jaccard level
    for j, m, d in LEVELS:
        for p in range(PAIRS_PER_LEVEL):
            a, b = doc, doc + 1
            doc += 2
            truth[(a, b)] = j
            ns = f"J{int(j * 10)}p{p}"
            for i in range(m):
                rows.append((a, f"{ns}_shared{i}"))
                rows.append((b, f"{ns}_shared{i}"))
            for i in range(d):
                rows.append((a, f"{ns}_onlyA{i}"))
                rows.append((b, f"{ns}_onlyB{i}"))
    return (
        spark.createDataFrame(rows, "doc_id bigint, shingle string"),
        truth,
    )


def test_wide_geometry_scurve(spark):
    sh, truth = _planted_shingles(spark)
    k = LSH_BANDS_WIDE * LSH_ROWS_WIDE
    pairs = lsh_candidate_pairs(
        lsh_bands(
            minhash_signature(sh, k=k),
            bands=LSH_BANDS_WIDE,
            rows=LSH_ROWS_WIDE,
        )
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in pairs.where(
            # planted pairs only: unrelated docs share no shingles, so
            # cross-pair candidates are astronomically unlikely, but
            # restrict anyway so a fluke can't distort a level's rate
            (F.col("doc_b") - F.col("doc_a") == 1)
            & (F.col("doc_a") % 2 == 0)
        ).collect()
    }
    rate = {}
    for j, _m, _d in LEVELS:
        planted = [pr for pr, lvl in truth.items() if lvl == j]
        rate[j] = sum(pr in got for pr in planted) / len(planted)

    # theory windows (n=40 per level, deterministic outcome)
    assert rate[0.9] >= 0.90, rate  # theory 0.9999
    assert 0.30 <= rate[0.7] <= 0.90, rate  # theory 0.61
    assert rate[0.5] <= 0.30, rate  # theory 0.061
    assert rate[0.3] <= 0.10, rate  # theory 0.002
    # the S-shape itself: monotone non-decreasing in J
    assert rate[0.3] <= rate[0.5] <= rate[0.7] <= rate[0.9], rate


# ---- verdict-level S-curve (VERDICT r9 item 7) ------------------------------
# The detection probability that matters operationally is not "did a
# band collide" but "did the pair land in one CLUSTER" — the verdict
# the keep-best step acts on. Planted levels concentrate on the
# production 0.6–0.9 Jaccard range around the b=16/r=8 knee (~0.71).

VERDICT_LEVELS = [
    (0.9, 36, 2),
    (0.8, 16, 2),
    (0.7, 14, 3),
    (0.6, 12, 4),
]


def _planted_at(spark, levels):
    rows, truth, doc = [], {}, 0
    for j, m, d in levels:
        for p in range(PAIRS_PER_LEVEL):
            a, b = doc, doc + 1
            doc += 2
            truth[(a, b)] = j
            ns = f"V{int(j * 10)}p{p}"
            for i in range(m):
                rows.append((a, f"{ns}_shared{i}"))
                rows.append((b, f"{ns}_shared{i}"))
            for i in range(d):
                rows.append((a, f"{ns}_onlyA{i}"))
                rows.append((b, f"{ns}_onlyB{i}"))
    return (
        spark.createDataFrame(rows, "doc_id bigint, shingle string"),
        truth,
    )


def test_wide_geometry_cluster_verdict_scurve(spark):
    """Co-clustering probability of the wide graph's CLUSTER verdicts
    tracks the band-collision theory 1-(1-J^8)^16: the connected-
    components step must neither lose detected pairs (every detected
    planted pair co-clusters) nor invent verdicts (unrelated docs
    share no shingles, so no cross-pair chaining), and each detected
    pair's cluster keeps exactly one representative (the min id —
    the survivor the keep-best family acts on)."""
    from map_reduce_library_spark.operators.dedup import (
        connected_components,
    )

    sh, truth = _planted_at(spark, VERDICT_LEVELS)
    k = LSH_BANDS_WIDE * LSH_ROWS_WIDE
    pairs = lsh_candidate_pairs(
        lsh_bands(
            minhash_signature(sh, k=k),
            bands=LSH_BANDS_WIDE,
            rows=LSH_ROWS_WIDE,
        )
    )
    clusters = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    rate = {}
    for j, _m, _d in VERDICT_LEVELS:
        planted = [pr for pr, lvl in truth.items() if lvl == j]
        rate[j] = sum(
            clusters.get(a) is not None and clusters.get(a) == clusters.get(b)
            for a, b in planted
        ) / len(planted)

    # theory: P(0.6)=0.24, P(0.7)=0.61, P(0.8)=0.95, P(0.9)=0.9999
    assert rate[0.9] >= 0.90, rate
    assert rate[0.8] >= 0.75, rate
    assert 0.30 <= rate[0.7] <= 0.90, rate
    assert 0.02 <= rate[0.6] <= 0.55, rate
    assert rate[0.6] <= rate[0.7] <= rate[0.8] <= rate[0.9], rate

    # verdict sanity: clusters are exactly the detected planted pairs
    # (no chaining across pairs), and min-id is the representative
    for (a, b), _j in truth.items():
        if clusters.get(a) is not None and clusters.get(a) == clusters.get(b):
            assert clusters[a] == a  # min id of the pair
    from collections import Counter

    sizes = Counter(clusters.values())
    assert all(n == 2 for n in sizes.values()), (
        "planted pairs must not chain into larger components"
    )
