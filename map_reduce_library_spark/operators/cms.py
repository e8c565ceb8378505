"""Count-Min sketch: a mergeable frequency sketch with bounded state.

The scale story: exact per-item counts over a 100-TB token stream keep
state proportional to the number of DISTINCT items (billions); a CMS
keeps exactly ``d x w`` integer cells no matter how wide the stream
gets, answers point frequency queries with a one-sided error
(``est >= exact`` for NON-NULL items, overshoot <= eN/w with
probability 1-e^-d), and merges by cell-wise addition — the same
partial-then-merge shape Spark's own partial aggregation uses, so
sketches built per partition/day/shard combine by a groupBy-sum.
NULL items are excluded at build and estimate 0 at lookup: NULL
hashes to a NULL bucket that could never be matched, so encoding it
would only corrupt the state bound (code-review r8).

Unlike HLL/approx_percentile (whose estimates are implementation-
defined and therefore rows-only checked in this corpus), a CMS is
DETERMINISTIC given its hash family: every cell is an exact integer
sum. Hashing reuses the MinHash recipe (operators/dedup.py:44-53) —
one md5 reduced to a 60-bit integer, then ``(a_j*x + b_j) mod P`` with
P = 2^31-1, all products inside signed 64-bit — so DuckDB reproduces
the whole sketch bit-for-bit and the driver hash-verifies the sketch
construction itself, not just its envelope.

Extension operator (SURVEY.md §2D approximate/sketches): map = per-
occurrence (row, bucket) cell coordinates, group = cell, reduce = sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.hashing import md5_prefix60

CMS_P = 2_147_483_647  # 2^31 - 1, prime (same modulus as MinHash)
CMS_W = 4_096  # buckets per hash row -> overshoot <= e*N/4096
CMS_D = 4  # hash rows -> error-bound failure prob e^-4 < 2%
# Distinct seed stream from the MinHash a/b constants (offset 101) so
# the two hash families never coincide.
CMS_A = [((j + 101) * 2_654_435_761 + 1) % CMS_P for j in range(CMS_D)]
CMS_B = [((j + 101) * 1_013_904_223 + 12_345) % CMS_P for j in range(CMS_D)]


def _x60(item):
    """60-bit md5 base value, mod P (identical in DuckDB as
    ``('0x' || substr(md5(item), 1, 15))::BIGINT % P``)."""
    return md5_prefix60(item) % CMS_P


def _bucket(j: int, x, w: int):
    return ((x * F.lit(CMS_A[j]) + F.lit(CMS_B[j])) % CMS_P) % w


def _cells(item_col: str, d: int, w: int):
    """The exploded (item-anchored) d-cell coordinate column — the
    sketch's IDENTITY, shared by build and lookup so the two can never
    drift apart (the hash-drift hazard md5_prefix60 was centralized to
    prevent; code-review r8 found this block duplicated with the w
    parameter silently ignored in one copy)."""
    if d > CMS_D:
        raise ValueError("extend CMS_A/CMS_B for deeper sketches")
    x = _x60(F.col(item_col))
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), _bucket(j, x, w).alias("bucket")
                )
                for j in range(d)
            ]
        )
    ).alias("cell")


def cms_build(
    df: DataFrame, item_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Sparse sketch relation [j, bucket, cnt, d, w] over the
    occurrences of ``df[item_col]`` (one increment per row; NULL items
    dropped — see module docstring). At most d*w rows ever exist; the
    (j, bucket) key domain is tiny, so map-side partial aggregation
    collapses the shuffle to ~d*w rows per task regardless of input
    size. The trailing ``d``/``w`` literals are the sketch's OWN
    geometry record (ADVICE r9: a sketch built at one geometry and
    probed at another silently violated the est >= exact contract —
    the relation now carries the facts ``cms_lookup`` validates
    against). Merge sketches with ``cms_merge``; probe via
    ``cms_lookup``."""
    cells = (
        df.where(F.col(item_col).isNotNull())
        .select(_cells(item_col, d, w))
        .select("cell.j", "cell.bucket")
    )
    return (
        cells.groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("d", F.lit(d))
        .withColumn("w", F.lit(w))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches — the mergeability that lets per-
    shard/per-day sketches roll up without raw data. Geometry columns
    ride through the union: a mixed-geometry merge leaves >1 distinct
    (d, w) in the result, which the next ``cms_lookup`` rejects loudly
    (cell-wise addition across different geometries is meaningless)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket", "d", "w").agg(
        F.sum("cnt").alias("cnt")
    ).select("j", "bucket", "cnt", "d", "w")


def cms_lookup(
    cms: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates for ``items[item_col]``: min over the
    d cells each item hashes to (absent cell -> 0; NULL items -> 0,
    they are never encoded). ``(d, w)`` must match the geometry the
    sketch was built with — w used to be silently pinned to CMS_W
    here, making non-default sketches unprobeable (code-review r8),
    and a build/probe geometry MISMATCH used to return silently wrong
    estimates that can violate the est >= exact one-sided contract
    (ADVICE r9). The sketch now carries its (d, w); the probe attaches
    the sketch's ≤d-row distinct (j, d, w) relation by a broadcast
    equi-join on the hash-row key j (no eager driver action — the r8
    TF-IDF lesson: a plan-time first()/count() would run the sketch
    build before the query exists; and j=0 exists in every non-empty
    sketch, so a mismatch always meets a matched row) and folds an
    ``assert_true`` into the estimate expression, so any mismatch
    fails the JOB with a clear message instead of returning wrong
    numbers. A legacy sketch without geometry columns is probed
    un-validated (documented hazard, unchanged behavior).

    Cost note (code-review r9): the geometry leg is a SECOND
    reference to the ``cms`` plan — if the caller passes the raw
    ``cms_build`` pipeline, that pipeline evaluates twice per lookup
    (measured ~0.15 s at sf0.1 on the registered query). The sketch
    is ≤ d×w rows: persist/localCheckpoint it (or write it to
    parquet — it IS the reusable artifact) when probing more than
    once; the validation guarantee is judged worth the one extra
    evaluation for ad-hoc single probes.

    The sketch is at most d*w rows — broadcast it; the lookup is then
    a scan-side broadcast join however many items are probed."""
    probes = items.select(item_col, _cells(item_col, d, w)).select(
        item_col, "cell.j", "cell.bucket"
    )
    est = F.coalesce(F.col("cnt"), F.lit(0))
    if "d" in cms.columns and "w" in cms.columns:
        # Keyed on j (a REAL column both sides carry), not a constant:
        # a constant equi-key constant-folds into a
        # BroadcastNestedLoopJoin, tripping the corpus-wide plan
        # audit. Hash row j=0 exists in every non-empty sketch and in
        # every probe, so any geometry mismatch meets >= one matched
        # row and the assert fires; an empty sketch leaves geo columns
        # NULL and estimates 0 as before.
        geo = (
            cms.select(
                "j",
                F.col("d").alias("_geo_d"),
                F.col("w").alias("_geo_w"),
            )
            .distinct()
        )
        probes = probes.join(F.broadcast(geo), "j", "left")
        geo_ok = F.col("_geo_d").isNull() | (
            (F.col("_geo_d") == F.lit(d)) & (F.col("_geo_w") == F.lit(w))
        )
        # assert_true returns NULL on success and raises otherwise;
        # folding it into est_n keeps it un-prunable by the optimizer
        # (a freestanding projected-away guard column would be
        # optimized out before it could ever fire).
        est = est + F.coalesce(
            F.assert_true(
                geo_ok,
                F.concat(
                    F.lit("cms_lookup geometry mismatch: sketch built "
                          "with (d, w) = ("),
                    F.col("_geo_d"), F.lit(", "), F.col("_geo_w"),
                    F.lit(f"), probed with ({d}, {w})"),
                ),
            ).cast("bigint"),
            F.lit(0),
        )
        cms = cms.drop("d", "w")
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left")
    return joined.groupBy(item_col).agg(F.min(est).alias("est_n"))
