"""Scale smoke: the MinHash-LSH pipeline on a 4x-replicated corpus
(~20k docs at sf0.1 shape) must stay fast and find every planted
clone pair — linear-ish behavior, no quadratic blowup."""

import time

from pyspark.sql import functions as F

from conftest import SF_CORRECTNESS

from map_reduce_library_spark.operators.dedup import minhash_lsh_pairs
from map_reduce_library_spark.tables import load_table


def test_minhash_on_replicated_corpus(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    n = docs.count()
    copies = [
        docs.select((F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text")
        for i in range(4)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)

    t0 = time.time()
    pairs = minhash_lsh_pairs(big)
    cnt = pairs.count()
    dt = time.time() - t0

    # Every doc now has 3 exact clones → at least C(4,2)=6 clone pairs
    # per original doc must be candidates (identical signatures).
    assert cnt >= 6 * n, (cnt, n)
    assert dt < 90, f"LSH on 4x corpus took {dt:.0f}s — quadratic regression?"

    # Spot-check: a doc and its clone are in the candidate set.
    sample = {
        (r.doc_a, r.doc_b)
        for r in pairs.where(F.col("doc_a") == 0).limit(10).collect()
    }
    assert (0, 1_000_000) in sample or any(b % 1_000_000 == 0 for _, b in sample)
