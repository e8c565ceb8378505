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
