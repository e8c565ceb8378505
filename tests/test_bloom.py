"""Bloom-filter join pruning: no-false-negative guarantee, pruning
effectiveness, empty-build rejection, and the oracle differential."""

from __future__ import annotations

from conftest import SF_CORRECTNESS, SF_SMOKE, assert_oracle_match
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
)
from map_reduce_library_spark.queries import QUERIES


def test_bloom_pruned_part_revenue_oracle(spark):
    assert_oracle_match(spark, "bloom_pruned_part_revenue")


def test_bloom_has_no_false_negatives(spark):
    """Every build key must survive its own filter — the property the
    pruned-join-equals-plain-join contract rests on."""
    build = spark.range(0, 5000).select(
        (F.col("id") * 7919 + 13).alias("key")
    )
    bloom = bloom_build(build, "key")
    survivors = bloom_prune(build, bloom, "key").count()
    assert survivors == 5000


def test_bloom_prunes_most_non_members(spark):
    """Disjoint probe keys: at m=2^17 bits / n=5000 keys / k=5 the
    designed FPR is (1 - e^{-kn/m})^k ~ 2e-4, so out of 20k
    non-members only a handful may leak through."""
    build = spark.range(0, 5000).select(
        (F.col("id") * 7919 + 13).alias("key")
    )
    probe = spark.range(0, 20000).select(
        (-F.col("id") - 1).alias("key")  # negative: disjoint from build
    )
    leaked = bloom_prune(probe, bloom_build(build, "key"), "key").count()
    assert leaked < 40, f"FPR far above design: {leaked}/20000"


def test_bloom_small_m_still_exact_after_join(spark):
    """Undersized filter (m=256 bits for 500 keys): the FP flood is
    the point — the exact join afterwards must still produce exactly
    the plain-join answer, proving prune-then-verify never depends on
    the filter being well sized."""
    build = spark.range(0, 500).select((F.col("id") * 3 + 1).alias("key"))
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    bloom = bloom_build(build, "key", m_bits=256)
    pruned = bloom_prune(probe, bloom, "key", m_bits=256)
    # many false positives sneak past the tiny filter...
    assert pruned.count() > probe.join(build, "key").count()
    # ...and the exact join clears every one of them
    got = sorted(r.key for r in pruned.join(build, "key").collect())
    want = sorted(r.key for r in probe.join(build, "key").collect())
    assert got == want


def test_bloom_empty_build_rejects_everything(spark):
    """Zero build rows -> empty word map -> every probe row rejected
    (absent words coalesce to 0 bits)."""
    build = spark.range(0, 10).where(F.col("id") < 0).select(
        F.col("id").alias("key")
    )
    probe = spark.range(0, 1000).select(F.col("id").alias("key"))
    assert bloom_prune(probe, bloom_build(build, "key"), "key").count() == 0


def test_bloom_null_keys_dropped(spark):
    """NULL build keys are not encoded (NULL never equi-joins) and
    NULL probe keys never pass the membership test."""
    build = spark.range(0, 100).select(
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("key")
    )
    bloom = bloom_build(build, "key")
    probe = spark.range(0, 100).select(
        F.when(F.col("id") % 2 == 1, F.col("id")).alias("key")
    )
    # odd ids were never built; nulls must not leak either
    assert bloom_prune(probe, bloom, "key").where(
        F.col("key").isNull()
    ).count() == 0


def test_bloom_prune_happens_before_exchange(spark):
    """The membership test must run on the scan side of the plan — no
    shuffle of unpruned probe rows. The bloom row itself arrives via a
    scalar-build broadcast; the probe side's first exchange, if any,
    sits above the filter."""
    plan = (
        QUERIES["bloom_pruned_part_revenue"](spark, SF_CORRECTNESS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan  # bit test inlined, JVM-side
    assert "BatchEvalPython" not in plan
    # the probe filter references the broadcast bloom map
    assert "might" not in plan  # sanity: no missing-function fallback


def test_bloom_prune_survives_smoke_scale(spark):
    """End-to-end at sf0.001 (distinct data distribution from the
    oracle-checked sf0.01 run)."""
    df = QUERIES["bloom_pruned_part_revenue"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    assert all(r.n_lines > 0 and r.revenue > 0 for r in rows)


def test_bloom_prune_matches_across_integral_widths(spark):
    """code-review r8 (verified): an int build key probed by a bigint
    fact key used to prune 100% of true matches (xxhash64 hashes the
    two widths differently) — the exact dtype pair a plain equi-join
    implicitly casts and matches. The canonical string cast makes
    every integral width agree."""
    from map_reduce_library_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(50).selectExpr("CAST(id AS INT) AS k")
    probe = spark.range(100).selectExpr("id AS k")  # bigint
    kept = bloom_prune(probe, bloom_build(build, "k"), "k")
    got = {r.k for r in kept.collect()}
    assert set(range(50)) <= got  # no false negatives across widths


def test_bloom_prune_matches_int_vs_fractional(spark):
    """ADVICE r9: an int build key probed by a DOUBLE fact key (5 vs
    5.0 — which a plain equi-join matches via implicit cast to
    double) used to silently false-negative under the bare string
    cast ('5' vs '5.0'). Numeric keys now canonicalize through double
    before hashing, so every numeric dtype mix agrees; both
    directions probed."""
    from map_reduce_library_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    ints = spark.range(50).selectExpr("CAST(id AS INT) AS k")
    doubles = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS k")
    kept = bloom_prune(doubles, bloom_build(ints, "k"), "k")
    assert set(range(50)) <= {int(r.k) for r in kept.collect()}

    kept2 = bloom_prune(
        ints, bloom_build(doubles.where("k < 30"), "k"), "k"
    )
    assert set(range(30)) <= {r.k for r in kept2.collect()}

    # decimal vs bigint (the DecimalType is NumericType, not
    # FractionalType-float — must route through double too)
    decs = spark.range(20).selectExpr("CAST(id AS DECIMAL(10,2)) AS k")
    kept3 = bloom_prune(
        spark.range(40).selectExpr("id AS k"), bloom_build(decs, "k"), "k"
    )
    assert set(range(20)) <= {r.k for r in kept3.collect()}


def test_bloom_prune_matches_numeric_vs_numeric_string(spark):
    """code-review r9: the dtype-aware canonicalization fixed
    int-vs-double but REGRESSED int-vs-'5' (a numeric build probed by
    a numeric-LOOKING string column, which a plain equi-join matches
    via implicit cast). The universal try_cast-through-double form
    restores it, both directions, while leaving non-numeric strings
    on the plain cast."""
    from map_reduce_library_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    ints = spark.range(50).selectExpr("CAST(id AS INT) AS k")
    strs = spark.range(100).selectExpr("CAST(id AS STRING) AS k")
    kept = bloom_prune(strs, bloom_build(ints, "k"), "k")
    assert {str(i) for i in range(50)} <= {r.k for r in kept.collect()}

    kept2 = bloom_prune(
        ints, bloom_build(strs.where("k < 30"), "k"), "k"
    )
    assert set(range(30)) <= {r.k for r in kept2.collect()}

    # non-numeric strings still round-trip on the plain cast
    words = spark.createDataFrame(
        [("alpha",), ("beta",), ("5.0",)], "k string"
    )
    kept3 = bloom_prune(words, bloom_build(words, "k"), "k")
    assert {r.k for r in kept3.collect()} == {"alpha", "beta", "5.0"}


def test_bloom_handles_date_timestamp_bool_and_float32_keys(spark):
    """code-review r9 round 2: the first universal form raised
    DATATYPE_MISMATCH at analysis for DATE keys (try_cast to double is
    a disallowed combo) and double-routed timestamps/booleans away
    from their string renderings. The string-first form must (a) not
    fail analysis on any dtype, (b) round-trip date/ts/bool builds,
    (c) match float32 builds probed by float64 (both route through
    the shortest-decimal rendering, not a widening binary cast)."""
    from map_reduce_library_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    dates = spark.sql(
        "SELECT sequence(DATE'2024-01-01', DATE'2024-01-20') AS ds"
    ).selectExpr("explode(ds) AS k")
    kept = bloom_prune(dates, bloom_build(dates, "k"), "k")
    assert kept.count() == 20

    ts = spark.sql(
        "SELECT explode(sequence(TIMESTAMP'2024-01-01 00:00:00',"
        " TIMESTAMP'2024-01-01 00:00:09', INTERVAL 1 SECOND)) AS k"
    )
    assert bloom_prune(ts, bloom_build(ts, "k"), "k").count() == 10

    floats = spark.createDataFrame(
        [(1.5,), (2.25,), (5.1,)], "k double"
    ).selectExpr("CAST(k AS FLOAT) AS k")
    doubles = spark.createDataFrame(
        [(1.5,), (2.25,), (5.1,), (9.9,)], "k double"
    )
    kept_f = bloom_prune(doubles, bloom_build(floats, "k"), "k")
    assert {1.5, 2.25, 5.1} <= {r.k for r in kept_f.collect()}


def test_bloom_negative_zero_matches_zero(spark):
    """ADVICE r10: Spark equi-joins normalize -0.0 = 0.0
    (NormalizeFloatingNumbers), so a -0.0 probe against a 0-keyed
    build (and the reverse) must survive pruning — the canonical form
    adds +0.0 to collapse the two renderings."""
    from map_reduce_library_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    neg = spark.sql("SELECT CAST('-0.0' AS DOUBLE) AS k")
    zero_int = spark.sql("SELECT 0 AS k")
    assert bloom_prune(neg, bloom_build(zero_int, "k"), "k").count() == 1
    assert bloom_prune(zero_int, bloom_build(neg, "k"), "k").count() == 1


def test_bloom_positions_are_spread(spark):
    """Whatever the position-derivation scheme (VERDICT r9 item 4
    explored Kirsch-Mitzenmacher; the measured-faster independent
    form shipped — see bloom_positions docstring), the k positions of
    a typical key must be (near-)distinct — a silent all-equal
    degeneracy would quietly run the filter at k=1 FPR."""
    from map_reduce_library_spark.operators.bloom import bloom_positions

    df = spark.range(1000).select(
        F.array(*bloom_positions(F.col("id"))).alias("ps")
    )
    min_distinct = df.select(
        F.size(F.array_distinct("ps")).alias("n")
    ).agg(F.min("n")).first()[0]
    assert min_distinct >= 4  # k=5; one collision allowed by wrap


def test_bloom_rejects_unaligned_m_bits(spark):
    """code-review r8 (verified): a non-multiple-of-64 m_bits used to
    drop the final partial word at build and read past the array at
    probe — must raise up front."""
    import pytest

    from map_reduce_library_spark.operators.bloom import bloom_build

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(spark.range(5), "id", m_bits=1000)


def test_bloom_prune_preserves_user_bloom_column(spark):
    """code-review r8: a probe relation with its own 'bloom' column
    must survive pruning intact (the broadcast column now rides under
    an internal name)."""
    from map_reduce_library_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(10).selectExpr("id AS k")
    probe = spark.range(20).selectExpr("id AS k", "id * 2 AS bloom")
    kept = bloom_prune(probe, bloom_build(build, "k"), "k")
    rows = {r.k: r.bloom for r in kept.collect()}
    assert all(rows[k] == 2 * k for k in rows)
    assert set(range(10)) <= set(rows)
