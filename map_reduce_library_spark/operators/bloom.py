"""Bloom-filter join pruning: shrink a huge probe side BEFORE the
join shuffle with a compact broadcast bit signature of the build keys.

The 100-TB motivation: a fact-to-filtered-dimension join where the
filtered dimension is too large to broadcast as a hash relation (tens
of millions of keys x payload) but whose *membership signature* — a
few MB of bits — still fits in every executor. Pruning the fact scan
with the signature removes the vast majority of rows before they are
shuffled; the exact join afterwards clears the false positives, so the
composition is semantically identical to the plain join (Bloom filters
have no false negatives). Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same
idea automatically, but its ``bloom_filter_agg`` expression is not
SQL-registered in 4.1 and fires only under cost heuristics; this
operator is the explicit, plan-visible form built from JVM built-ins
only (xxhash64 / bit_or / shiftleft — whole-stage codegen throughout,
no UDFs).

Layout: ``m_bits`` bit positions packed into 64-bit words, carried as
a one-row DENSE ``array<bigint>`` of length m/64 (words no key touched
are 0, so an empty build side yields an all-zero array that rejects
every probe row). Dense matters: Spark's ``element_at`` on a map is a
linear scan of the entries per lookup (maps have no hash index in the
unsafe row format), which puts k * n_words comparisons on EVERY probe
row — the sf0.1 query measured 2.6 s as a map vs 1.7 s dense; the
array index is O(1) per lookup. The aggregation still builds the sparse word map (shuffle
carries only touched words); densification is a single one-row
``transform`` at the end. k hash positions per key come from
``xxhash64(key, i)`` for i in 0..k-1 — seeding by an extra hashed
column, the same trick the MinHash family uses (operators/dedup.py).

Extension operator — ABSENT in the reference (single-input API, no
joins; SURVEY.md §2D): built on the same map/group/reduce core (map =
per-key positions, group = per-word bit_or, reduce = map assembly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ~16 KiB of bits. Sized for the test corpus (build sides of 1e2..1e4
# keys -> FPR well under 1%); at a real 100-TB scale you size m from
# n·k/ln2 (e.g. 50M keys, k=5 -> ~45 MB), still broadcast-friendly.
BLOOM_M_BITS = 1 << 17
BLOOM_K = 5


def canonical_bloom_key(key: Column | str) -> Column:
    """The UNIVERSAL canonical form every bloom key is hashed through:

        s := CAST(key AS string)
        coalesce(CAST(try_cast(s AS double) AS string), s)

    — cast to STRING FIRST (legal for every Spark dtype, so the
    expression never fails analysis — a direct try_cast(key AS
    double) raises DATATYPE_MISMATCH for DATE/binary/array keys,
    code-review r9), then re-parse: anything whose string rendering
    is double-interpretable — every numeric dtype and numeric-looking
    strings — canonicalizes to the parsed double's string form;
    dates, timestamps, booleans, and non-numeric strings keep their
    plain rendering (matching the pre-r9 behavior for those dtypes).
    One dtype-free expression, so build and probe CANNOT disagree no
    matter which side is int, bigint, float, decimal, or the string
    '5': all the numeric mixes a plain equi-join would match via its
    implicit cast-to-double (5 vs 5.0 vs '5') hash identically —
    including float32 vs float64, because BOTH route through the
    shortest-decimal string rendering rather than one side taking a
    widening binary cast. Consistent routing cannot create false
    NEGATIVES: a true-matching pair collapses to the same canonical
    string on both sides; distinct keys collapsing together only add
    false positives, which a Bloom filter tolerates by design.

    The ``+ 0.0`` normalizes negative zero (ADVICE r10): Spark
    equi-joins treat -0.0 = 0.0 (NormalizeFloatingNumbers), but the
    string renderings differ ('-0.0' vs '0.0') — without the
    normalization a -0.0 probe against a 0-keyed build would be the
    one false negative the contract forbids. (-0.0 + 0.0 = +0.0 under
    IEEE 754 round-to-nearest; every other value, including NaN and
    the infinities, is unchanged.)"""
    c = F.col(key) if isinstance(key, str) else key
    s = c.cast("string")
    return F.coalesce(
        (s.try_cast("double") + F.lit(0.0)).cast("string"), s
    )


def bloom_positions(
    key: Column,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    canonical: bool = False,
) -> list[Column]:
    """The k bit positions of ``key``: pmod(xxhash64(key, i), m) —
    k INDEPENDENT seeded hashes, kept deliberately after measuring
    the Kirsch-Mitzenmacher alternative (VERDICT r9 item 4). KM
    (position_i = h1 + i·h2 mod m from two hash evaluations) is the
    textbook constant-factor win, but it presumes the two hash values
    are computed once and REUSED — and Spark's whole-stage-codegen
    Filter evaluates each conjunct of the membership AND
    independently (subexpression elimination applies to Project/
    Aggregate, not across short-circuit Filter conjuncts), so the
    inlined h1/h2 trees are re-evaluated inside EVERY conjunct:
    2k hash+canonicalization evaluations per probe row versus k for
    this form. Measured on `bloom_pruned_part_revenue` at sf0.1
    (min-of-3, same session, both directions): independent-k
    1.59-2.09 s, KM 3.06-3.28 s. A guaranteed-once evaluation would
    need a materialization barrier below the filter, which predicate
    pushdown removes for deterministic projections — so the
    independent form IS the faster plan under Spark's execution
    model (BASELINE.md §round-10 bloom note).

    The key is hashed through the CANONICAL form (see
    ``canonical_bloom_key``): xxhash64 hashes an int and a bigint
    holding the same value differently, so a build/probe dtype
    mismatch (int dimension key vs bigint fact key — exactly the pair
    a plain equi-join would implicitly cast and match) would
    otherwise prune 100% of true matches, a silent false-negative
    wipeout of the 'no false negatives' contract (code-review r8,
    verified; widened to fractional and numeric-string mixes in r9,
    and to -0.0 vs 0.0 in r10). Build and probe hash the same
    canonical form, so the no-false-negative property holds.
    ``canonical=True`` marks ``key`` as already canonicalized (skips
    re-wrapping; the result is identical either way since the
    canonical form is a fixed point of itself)."""
    kc = key if canonical else canonical_bloom_key(key)
    return [
        F.pmod(F.xxhash64(kc, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _check_m_bits(m_bits: int) -> None:
    """The dense layout packs bits into 64-bit words; a non-multiple
    of 64 would silently drop the last partial word's bits at build
    (false negatives) and read past the array at probe (ANSI
    INVALID_ARRAY_INDEX) — validated loudly instead (code-review
    r8, verified)."""
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(
            f"m_bits must be a positive multiple of 64, got {m_bits}"
        )


def _bit_mask(p: Column) -> Column:
    """1L << (p % 64). ``F.shiftleft`` only takes a literal shift
    amount in the Python API; ``call_function`` passes the Column
    through to the JVM shiftleft."""
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        p.bitwiseAND(F.lit(63)).cast("int"),
    )


def bloom_build(
    df: DataFrame,
    key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """One-row DataFrame [bloom: array<bigint>, len m/64] over
    ``df[key]``.

    Shape: explode the k positions (k rows per key), partial-aggregate
    bit_or per 64-bit word (map-side combine collapses this to at most
    m/64 rows per task before the shuffle), assemble the sparse word
    map in a single-row final merge — the same partial-then-merge-
    scalar shape as every global aggregate in the corpus — then
    densify once into the O(1)-indexable word array. NULL keys are
    dropped: NULL never equi-joins, so encoding it would only add
    false positives.
    """
    _check_m_bits(m_bits)
    pos = F.array(
        *bloom_positions(
            canonical_bloom_key(key), m_bits, k, canonical=True
        )
    )
    words = (
        df.where(F.col(key).isNotNull())
        .select(F.explode(pos).alias("p"))
        .select(
            F.shiftright("p", 6).cast("int").alias("word"),
            _bit_mask(F.col("p")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    sparse = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(m_bits // 64 - 1)),
        lambda w: F.coalesce(
            F.element_at(F.col("m"), w), F.lit(0).cast("bigint")
        ),
    )
    return sparse.select(dense.alias("bloom"))


def bloom_might_contain(
    bloom: Column,
    key: Column,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    canonical: bool = False,
) -> Column:
    """True iff all k bit positions of ``key`` are set (no false
    negatives; false positives at the designed FPR). The dense word
    array is indexed O(1) per position (1-based ``element_at``); an
    all-zero (empty-build) array rejects everything. A bare Column is
    canonicalized automatically (code-review r9: the old default left
    direct build+probe callers on mismatched forms), so this pairs
    with ``bloom_build`` out of the box; ``canonical=True`` skips the
    re-wrap for a pre-canonicalized column (identical bits either
    way)."""
    cond = F.lit(True)
    for p in bloom_positions(key, m_bits, k, canonical=canonical):
        word = F.shiftright(p, 6).cast("int")
        mask = _bit_mask(p)
        bits = F.element_at(bloom, word + F.lit(1))
        cond = cond & (bits.bitwiseAND(mask) != 0)
    return cond


def bloom_prune(
    probe: DataFrame,
    bloom_row: DataFrame,
    key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``key`` might be in the filter.

    The one-row bloom relation rides in on a broadcast nested-loop
    join with a scalar build side — constant size, linear probe work
    (the reviewed ALLOWED_SCALAR_ATTACH plan shape) — and the bit test
    runs inside whole-stage codegen on the scan, before any shuffle.

    The broadcast column is attached under a collision-proof internal
    name: a probe relation with its own 'bloom' column used to hit an
    ambiguous reference (or lose its column to the trailing drop)
    (code-review r8).
    """
    _check_m_bits(m_bits)
    tmp = "__bloom_bits"
    if tmp in probe.columns:
        raise ValueError(f"probe may not contain a column named {tmp!r}")
    pruned = (
        probe.crossJoin(
            F.broadcast(bloom_row.select(F.col("bloom").alias(tmp)))
        )
        .where(
            bloom_might_contain(
                F.col(tmp),
                canonical_bloom_key(key),
                m_bits,
                k,
                canonical=True,
            )
        )
        .drop(tmp)
    )
    return pruned
