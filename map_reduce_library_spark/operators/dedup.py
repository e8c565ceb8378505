"""Deduplication operators for training-data pipelines.

Exact dedup, MinHash+LSH near-dedup, SimHash fingerprinting, n-gram
Jaccard similarity, and embedding-cosine near-dup — all pure
DataFrame compositions (no Python UDFs in any hot path; every hash is
the JVM-side ``md5`` builtin so the DuckDB oracle can reproduce it
byte-for-byte).

These extend the reference's map/group/reduce core (SURVEY.md §2D:
dedup is ABSENT from the reference; each operator here is expressible
as map → group-by-key → reduce, which is how it inherits the §2A
semantics — e.g. MinHash = map(doc → (doc, shingle-hash)) then
reduce(min)).

Scale design (100 TB stance):
- Shingling explodes ~L rows per doc but is immediately re-aggregated
  by (doc, shingle) distinct + one groupBy(doc) — two narrow shuffles
  proportional to corpus token count.
- The K minhashes are K parallel ``min`` aggregates in ONE groupBy —
  no per-seed data explosion.
- LSH banding turns the O(n²) all-pairs problem into a self-join on
  (band_id, band_signature): only docs sharing a bucket meet. Bucket
  skew (a viral boilerplate string) is the known hazard → AQE skew
  join handles moderate skew; pathological buckets are capped by
  ``lsh_candidate_pairs(max_bucket=...)`` (drop + audit buckets with
  > N members as "template spam" via ``lsh_hot_buckets``).
- Exact n-gram Jaccard is O(candidate pairs); at scale feed it the
  LSH candidates (``candidates=``), never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.hashing import md5_prefix60

# Shared constants — the oracle SQL generators in querydefs/dedup.py
# use the same values so both engines compute identical candidates.
SHINGLE_N = 3
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3  # MINHASH_K == LSH_BANDS * LSH_ROWS
SIMHASH_BITS = 32

# Universal-hash MinHash permutations: ONE md5 per shingle yields a
# 60-bit base value x; h_i(x) = (a_i * (x mod P) + b_i) mod P with
# P = 2^31 - 1 (prime). (x mod P) < 2^31 and a_i < 2^31 keep every
# product inside a signed 64-bit, so Spark and DuckDB BIGINT
# arithmetic agree bit-for-bit. Measured at sf0.1: the previous
# 12-md5-per-shingle form cost +1.2 s over the shingle scan; the
# permutation form amortizes to one md5.
MINHASH_P = 2_147_483_647


def minhash_coeffs(k: int) -> tuple[list[int], list[int]]:
    """(a, b) coefficient lists for the K-permutation universal-hash
    family h_i(x) = (a_i * x + b_i) mod P. Deterministic (Knuth
    multiplicative constants), so the DuckDB oracle generators can
    rebuild the identical family from ``k`` alone. Every a_i < P and
    x < P keep a_i * x inside signed 64-bit in both engines. a_i is
    an affine bijection of i mod P, so EXACTLY ONE index below P is
    degenerate: a_i = 0 at i = 1_325_634_255 (i ≡ -C⁻¹ mod P) — a
    constant permutation that would collapse that hash lane into one
    LSH bucket corpus-wide. No practical signature is 1.3 billion
    hashes wide, but the guard is a real raise (not an assert
    stripped under ``python -O``) so the failure is loud, not a
    silent recall collapse (code-review r8)."""
    a = [(i * 2_654_435_761 + 1) % MINHASH_P for i in range(k)]
    b = [(i * 1_013_904_223 + 12_345) % MINHASH_P for i in range(k)]
    if not all(a):
        raise ValueError(
            "k exceeds the degenerate index 1_325_634_255 of this "
            "coefficient family; pick a different affine constant"
        )
    return a, b


MINHASH_A, MINHASH_B = minhash_coeffs(MINHASH_K)

# Production-width configuration (VERDICT r7 item 1): K=12/4x3 is an
# sf-0.01-sized signature whose S-curve is too shallow for real
# near-dedup targets; 128 hashes in 16 bands x 8 rows puts the
# detection-probability knee at t = (1/16)^(1/8) ~= 0.71 Jaccard —
# the standard web-scale setting (cf. Lee et al. 2022, RefinedWeb).
# tests/test_dedup_scurve.py measures the curve empirically.
MINHASH_K_WIDE = 128
LSH_BANDS_WIDE = 16
LSH_ROWS_WIDE = 8


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by full-text equality: one representative (min id)
    per distinct text plus the copy count.

    Groups by (md5(text), length(text)) rather than the raw text, so
    the exchange keys are 32-byte digests + a long instead of
    arbitrary-length documents (the round-3 verdict's task 6). The
    text itself still rides along once per group — partial (map-side)
    aggregation collapses copies before the shuffle — via ``first``,
    which is deterministic here because every row in a group carries
    the identical string (an md5+length collision between different
    texts is the only exception, and 2^-128-grade impossible; length
    is included as the extra belt anyway). Same output columns as
    before: (text, id, n_copies)."""
    return (
        df.groupBy(
            F.md5(F.col(text_col)).alias("__text_md5"),
            F.length(F.col(text_col)).alias("__text_len"),
        )
        .agg(
            F.first(text_col).alias(text_col),
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(text_col, id_col, "n_copies")
    )


def normalize_for_dedup(c: "F.Column | str") -> "F.Column":
    """Dedup-canonical text form (VERDICT r7 item 2 — standard
    C4/RefinedWeb practice): casefold, strip punctuation/symbols to
    spaces, collapse whitespace runs, trim. Shingling RAW text misses
    trivially-reformatted duplicates ("Hello, World!" vs "hello
    world"); shingling the canonical form catches them. Built only
    from lower/regexp_replace/trim so the DuckDB oracle reproduces it
    byte-for-byte (both regex engines support \\p{L}/\\p{N} classes).
    NFC unicode normalization is deliberately absent HERE: Spark has
    no JVM-side builtin for it, and Python in the per-shingle hot
    path is the one cost this module refuses — NFC-variant text is
    normalized at ingest instead, where the pass runs once per
    document (``operators/text.py::unicode_normalize``, an Arrow
    ``mapInPandas`` stage)."""
    c = F.col(c) if isinstance(c, str) else c
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SHINGLE_N,
    distinct: bool = True,
    normalize: bool = False,
) -> DataFrame:
    """Word n-gram shingles per document: (id, shingle).

    ``distinct=True`` (set semantics — required for Jaccard) costs one
    hash shuffle; pass ``distinct=False`` for consumers that are
    duplicate-idempotent (MinHash: min over repeats is the min) to
    skip that shuffle entirely.

    ``normalize=True`` shingles ``normalize_for_dedup(text)`` instead
    of the raw text — the production setting; the raw default keeps
    existing oracles byte-stable."""
    text_expr = (
        normalize_for_dedup(text_col) if normalize else F.col(text_col)
    )
    toks = df.select(id_col, F.split(text_expr, " ").alias("toks"))
    shingle_expr = (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(0, size(toks)-{n}), i -> "
        f"concat_ws(' ', {', '.join(f'toks[i+{j}]' for j in range(n))})) "
        f"ELSE array() END"
    )
    out = toks.select(id_col, F.explode(F.expr(shingle_expr)).alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signature(
    shingle_df: DataFrame, id_col: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    """K-permutation MinHash via universal hashing: ONE md5 per
    shingle is reduced to a 60-bit integer x, and h_i(doc) = min over
    shingles of (a_i * (x mod P) + b_i) mod P — K integer-arithmetic
    permutations of a single hash instead of K md5 evaluations (the
    standard a*x+b mod prime MinHash family). One pre-projection
    computes x once per shingle row; one groupBy computes all K
    mins."""
    ca, cb = minhash_coeffs(k)
    x = md5_prefix60(F.col("shingle")) % MINHASH_P
    shx = shingle_df.select(id_col, x.alias("x"))
    # r14: each agg is ONE parsed SQL string instead of a Column
    # expression tree assembled call-by-call — the Column form cost
    # ~6 py4j driver roundtrips per permutation, which at the
    # production K=128 made PLAN CONSTRUCTION ~1.4 s per build
    # (measured warm; half of minhash_lsh_pairs_wide's bench time —
    # guide §7.3 driver-side work). The parser produces the identical
    # arithmetic ((x * a + b) % P in BIGINT — every literal fits
    # signed 64-bit), so signatures are bit-identical.
    aggs = [
        F.expr(f"min((x * {ca[i]} + {cb[i]}) % {MINHASH_P}) AS h{i}")
        for i in range(k)
    ]
    return shx.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Reshape the K-wide signature into (id, band_id, band_sig) rows:
    band b's signature is the '|'-joined concatenation of its `rows`
    minhash integers (the separator prevents (1,23)/(12,3) band
    collisions)."""
    stack_args = []
    for b in range(bands):
        cols = "concat_ws('|', {})".format(
            ", ".join(f"h{b * rows + r}" for r in range(rows))
        )
        stack_args.append(f"{b}, {cols}")
    expr = f"stack({bands}, {', '.join(stack_args)}) AS (band_id, band_sig)"
    return sig_df.selectExpr(id_col, expr)


def lsh_hot_buckets(
    band_df: DataFrame, max_bucket: int
) -> DataFrame:
    """Audit relation for the hot-bucket cap: every (band_id,
    band_sig) bucket with more than ``max_bucket`` members and its
    size. At 100 TB these are the "template spam" buckets — one viral
    boilerplate string shared by 10⁵ docs makes a 10¹⁰-row self-join
    fan-out no AQE skew split can absorb. Persist/log this relation as
    the side output whenever the cap is enabled so dropped buckets are
    audited, never silently lost."""
    return (
        band_df.groupBy("band_id", "band_sig")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > max_bucket)
    )


def lsh_candidate_pairs(
    band_df: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    observation=None,
) -> DataFrame:
    """Self-join on (band_id, band_sig): docs agreeing on any band are
    near-dup candidates. Returns distinct (doc_a, doc_b), a < b.

    ``max_bucket`` (the round-3 verdict's task 5) drops buckets with
    more members than the cap BEFORE the self-join: candidate fan-out
    per bucket is |bucket|², so one pathological bucket dominates the
    whole job while contributing pairs that are template spam, not
    meaningful near-dups (the standard mitigation in production dedup
    pipelines). The hot-bucket relation is tiny by construction
    (buckets over the cap), so it broadcasts into a left-anti join —
    one extra aggregate over the band relation, no extra shuffle of
    the big side beyond the join it already does.

    Default ``None`` (no cap) keeps exact parity with the DuckDB
    oracles; production configs should set it (e.g. 1000) and audit
    the drop via ``observation`` (or the ``lsh_hot_buckets`` relation
    as a persisted side output).

    ``observation``: a ``pyspark.sql.Observation`` reporting
    ``n_band_rows_dropped`` / ``n_band_rows_total`` IN-LINE with the
    pairs action itself — no second audit pass over the band relation.
    Placement matters: the metrics CANNOT live on the hot-bucket
    relation (the natural spot), because that is the anti-join's
    broadcast build side and AQE's empty-relation propagation deletes
    the whole build subtree — CollectMetrics included — exactly in the
    zero-drops case the metric exists to report (verified empirically:
    ``Observation.get`` then dies instead of returning zeros). So the
    audited path marks hot rows via a broadcast LEFT join + filter
    (anti-join semantics, same broadcast, no extra shuffle) and
    observes the marked relation, which lives on the surviving probe
    lineage whether or not anything was dropped. Bucket IDENTITIES
    (which signatures, how big) stay with the ``lsh_hot_buckets``
    audit relation — persist that when you need more than counts."""
    if max_bucket is not None:
        hot = lsh_hot_buckets(band_df, max_bucket).select(
            "band_id", "band_sig", F.lit(1).alias("__hot")
        )
        if observation is not None:
            marked = band_df.join(
                F.broadcast(hot), ["band_id", "band_sig"], "left"
            ).observe(
                observation,
                F.coalesce(F.sum("__hot"), F.lit(0)).alias(
                    "n_band_rows_dropped"
                ),
                F.count(F.lit(1)).alias("n_band_rows_total"),
            )
            band_df = marked.where(F.col("__hot").isNull()).drop("__hot")
        else:
            band_df = band_df.join(
                F.broadcast(hot.select("band_id", "band_sig")),
                ["band_id", "band_sig"],
                "left_anti",
            )
    a = band_df.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_sig"
    )
    b = band_df.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_sig"
    )
    return (
        a.join(b, ["band_id", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    observation=None,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    normalize: bool = False,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate candidate pairs.

    Measured trade-off (sf0.1): shingle dup factor is ~2, so the
    distinct shuffle pays for itself by halving the 12-hash work —
    distinct-first wins (1.9s vs 2.7s warm). On corpora with near-zero
    in-doc shingle repetition, pass ``distinct=False`` to skip the
    shuffle instead (min is duplicate-idempotent either way).

    ``max_bucket`` / ``observation`` forward to
    ``lsh_candidate_pairs`` — set them in production to bound the
    per-bucket quadratic fan-out and count what the cap dropped.

    ``bands``/``rows`` select the LSH geometry (signature width is
    their product): the K=12/4x3 default keeps the small-sf oracles
    cheap; production near-dedup at a ~0.7-0.8 Jaccard target should
    pass ``bands=LSH_BANDS_WIDE, rows=LSH_ROWS_WIDE`` (16x8, K=128)
    for a sharp S-curve — the cost scales only the per-doc signature
    aggregate and the band relation height, never the shingle scan.

    ``shingle_df`` forwards a materialized (id, shingle) relation
    (the shared-checkpoint pattern — shingles are geometry-
    independent, so narrow and wide signatures read ONE scan; at
    scale it is the shingle table written to parquet once). When
    given, ``text_col``/``normalize`` are ignored."""
    return lsh_candidate_pairs(
        lsh_bands(
            minhash_signature(
                shingle_df
                if shingle_df is not None
                else shingles(df, text_col, id_col, normalize=normalize),
                id_col,
                k=bands * rows,
            ),
            id_col,
            bands=bands,
            rows=rows,
        ),
        id_col,
        max_bucket=max_bucket,
        observation=observation,
    )


def incremental_lsh_pairs(
    index_bands: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_new: bool = True,
    incoming_bands: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Ingest-time near-dup detection: candidate pairs touching a NEW
    batch of documents, given the already-banded signature index of
    the existing corpus.

    This is the production dedup shape at 100 TB: the corpus signature
    index is a persisted table written once and APPENDED per ingest
    tick; each tick hashes only its own batch (O(|batch|) shingle/
    minhash work, not a corpus rescan) and probes the index with a
    band equi-join. With ``broadcast_new`` (the default — an ingest
    tick is bounded, the corpus is not) the new batch's band relation
    broadcasts, so the petabyte-scale index side is never shuffled:
    the probe is a map-side join over the index scan. Set it False
    when a backfill-sized batch should fall back to a shuffle join
    (AQE will still demote it to broadcast if it turns out small).

    Returns distinct (doc_a, doc_b), a < b, exactly the subset of the
    full-corpus ``minhash_lsh_pairs`` whose pairs touch >= 1 new doc —
    so running ticks in ANY order and unioning yields the batch
    answer (cross-batch pairs appear when their later side arrives;
    in-batch pairs come from the self-join). Pinned by
    ``tests/test_incremental_dedup.py``.

    ``incoming_bands``: pass the batch's precomputed (and ideally
    materialized) band relation to avoid re-deriving the shingle →
    minhash pipeline — the probe and both self-join sides reference
    it, so a caller that also persists the bands (the streaming
    ingest tick) should hash the batch exactly once.

    ``max_bucket``: hot-bucket cap for viral boilerplate (see the
    inline block) — set it in production exactly as on
    ``minhash_lsh_pairs``; None keeps full-answer parity with the
    uncapped batch pipeline.
    """
    new_bands = (
        incoming_bands
        if incoming_bands is not None
        else lsh_bands(
            minhash_signature(shingles(incoming, text_col, id_col), id_col),
            id_col,
        )
    )
    if max_bucket is not None:
        # Hot-bucket cap for the INGEST path (the full-corpus path has
        # it via lsh_candidate_pairs; without one here a viral
        # boilerplate band_sig with B index members × b batch members
        # yields B·b probe rows EVERY tick, forever). Semantics match
        # the capped batch variant: a bucket whose COMBINED
        # (index + batch) membership exceeds the cap contributes no
        # pairs from this tick. Computing combined counts scans the
        # index once — the same order of work as the probe join
        # itself; a production deployment persists per-bucket counts
        # next to the band index and feeds them here instead. Batch
        # self-join buckets need no second cap: combined ≤ cap implies
        # batch-only ≤ cap. The caller still appends the UNCAPPED
        # bands to the index — the cap drops pairs, never membership.
        # Membership is COUNT(DISTINCT doc_id), not raw rows: the
        # persisted index legitimately carries duplicate rows after
        # an at-least-once replay or a compact_index crash window
        # (both absorbed by every other reader), and a row count
        # would double those buckets' apparent size and silently drop
        # legitimate near-dup pairs below the cap (code-review r7).
        # On clean data distinct-count == row count, so batch parity
        # with the uncapped oracle is unchanged.
        hot = F.broadcast(
            index_bands.select("band_id", "band_sig", id_col)
            .unionByName(new_bands.select("band_id", "band_sig", id_col))
            .groupBy("band_id", "band_sig")
            .agg(F.count_distinct(F.col(id_col)).alias("__n"))
            .where(F.col("__n") > max_bucket)
            .select("band_id", "band_sig")
        )
        index_bands = index_bands.join(
            hot, ["band_id", "band_sig"], "left_anti"
        )
        new_bands = new_bands.join(
            hot, ["band_id", "band_sig"], "left_anti"
        )
    probe = F.broadcast(new_bands) if broadcast_new else new_bands
    vs_index = (
        index_bands.select(
            F.col(id_col).alias("doc_a"), "band_id", "band_sig"
        )
        .join(
            probe.select(
                F.col(id_col).alias("doc_b"), "band_id", "band_sig"
            ),
            ["band_id", "band_sig"],
        )
        .where(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
    )
    in_batch = lsh_candidate_pairs(new_bands, id_col)
    return vs_index.unionByName(in_batch).distinct()


def text_digests(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(md5, length, id) digest rows — the exact-dup index schema.
    Fixed-width keys only; the text never leaves the scan."""
    return df.select(
        F.md5(F.col(text_col)).alias("d_md5"),
        F.length(F.col(text_col)).alias("d_len"),
        F.col(id_col),
    )


def incremental_exact_verdict(
    index_digests: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    incoming_digests: DataFrame | None = None,
) -> DataFrame:
    """Ingest-time EXACT dedup against a persisted digest index — the
    companion of ``incremental_lsh_pairs`` for byte-identical copies.

    ``index_digests``: the corpus's (d_md5, d_len, doc_id) table
    (built once by ``text_digests``, appended per tick). Each tick
    digests only its own batch; the corpus-side index is probed with a
    broadcast of the batch digests and never reshuffled.

    Returns one row per incoming doc:
      dup_of_corpus — min existing doc id with the same digest (NULL
                      if the text is new to the corpus),
      batch_rep     — min incoming doc id with the same digest (self
                      when unique in the batch),
      is_kept       — the ingest decision: not in the corpus AND this
                      row is its batch's representative.
    """
    # All digest joins are NULL-SAFE (<=>): a NULL text digests to
    # (NULL, NULL), and groupBy already groups NULL keys, so NULL-text
    # docs dedup against each other like any other value instead of
    # silently vanishing from the verdict (an equi-join would never
    # match their rows, breaking the one-row-per-incoming-doc
    # contract).
    # ``incoming_digests``: pass the batch's precomputed (and ideally
    # materialized) digest relation — the probe, batch_rep, and
    # probe_keys branches all reference it, so a caller that also
    # persists the digests (the streaming ingest tick) should md5 the
    # batch exactly once (the incoming_bands pattern).
    probe = (
        incoming_digests
        if incoming_digests is not None
        else text_digests(incoming, text_col, id_col)
    )
    batch_rep = probe.groupBy("d_md5", "d_len").agg(
        F.min(id_col).alias("batch_rep")
    )

    def _ns(a_md5, a_len):
        return F.col("d_md5").eqNullSafe(F.col(a_md5)) & F.col(
            "d_len"
        ).eqNullSafe(F.col(a_len))

    # Prune the index scan FIRST (broadcast semi-join on the batch's
    # digest set — map-side, no index shuffle), then aggregate the
    # few surviving rows: the per-tick work is O(|batch| + matches),
    # not O(|corpus|).
    probe_keys = F.broadcast(
        probe.select(
            F.col("d_md5").alias("p_md5"), F.col("d_len").alias("p_len")
        ).distinct()
    )
    matched = (
        index_digests.join(probe_keys, _ns("p_md5", "p_len"), "left_semi")
        .groupBy("d_md5", "d_len")
        .agg(F.min(id_col).alias("dup_of_corpus"))
        .select(
            F.col("d_md5").alias("m_md5"),
            F.col("d_len").alias("m_len"),
            "dup_of_corpus",
        )
    )
    reps = batch_rep.select(
        F.col("d_md5").alias("b_md5"),
        F.col("d_len").alias("b_len"),
        "batch_rep",
    )
    return (
        probe.select(F.col(id_col).alias("new_id"), "d_md5", "d_len")
        .join(F.broadcast(matched), _ns("m_md5", "m_len"), "left")
        .join(F.broadcast(reps), _ns("b_md5", "b_len"))
        .select(
            "new_id",
            "dup_of_corpus",
            "batch_rep",
            (
                F.col("dup_of_corpus").isNull()
                & (F.col("batch_rep") == F.col("new_id"))
            ).alias("is_kept"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs with
    |A∩B| / |A∪B| >= threshold. Without ``candidates`` this meets every
    pair sharing >= 1 shingle (fine at test SFs, O(n²)-ish at scale);
    pass the LSH candidate pairs to bound the work at 100 TB.

    With candidates the plan is CANDIDATE-FIRST: expand each candidate
    pair with doc_a's shingles, then equi-join doc_b's shingles on
    (doc_b, shingle) — O(|candidates| x shingles-per-doc) work. The
    alternative (score every co-shingle pair, then semi-join the
    candidates) re-opens the quadratic hot-shingle blowup LSH exists
    to avoid: one boilerplate trigram shared by 1e5 docs yields 1e10
    join rows before the filter ever runs.

    ``shingle_df``: pass a precomputed (ideally materialized) shingle
    relation — ``ds`` feeds three plan branches (sizes + both join
    sides), so without it the tokenize→explode→distinct pipeline runs
    up to three times per call (the ``counted=``/``sigs=`` pattern)."""
    ds = (
        shingle_df
        if shingle_df is not None
        else shingles(df, text_col, id_col)
    )
    sizes = ds.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        # Normalize the precondition instead of assuming it: duplicate
        # or (b,a)-ordered candidate rows would inflate n_inter (wrong
        # Jaccard) or emit swapped pairs. The distinct is over the
        # candidate relation only — tiny next to the shingle join.
        cand = (
            candidates.select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .where(F.col("doc_a") < F.col("doc_b"))
            .distinct()
        )
        a_sh = ds.select(F.col(id_col).alias("doc_a"), "shingle")
        b_sh = ds.select(F.col(id_col).alias("doc_b"), "shingle")
        inter = (
            cand.join(a_sh, "doc_a")
            .join(b_sh, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = ds.select(F.col(id_col).alias("doc_a"), "shingle")
        b = ds.select(F.col(id_col).alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, tok, cnt) distinct-token counts — the shared tokenize+count
    prefix of the whole SimHash family (string fingerprint, integer
    fingerprint, wide hamming fingerprint). Pre-aggregating to
    (doc, token, count) makes every downstream hash/parity expression
    evaluate once per DISTINCT token per doc, not once per occurrence
    — ~30x less expression work on natural-language token
    distributions, same result (counts are the weights).

    Consumers running more than one SimHash variant should materialize
    this once (checkpoint/parquet) and pass it to each via the
    ``counted=`` parameter — the LSH-candidate-graph sharing pattern
    (querydefs/dedup.py) applied to the token relation."""
    tok = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    return tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))


def _simhash_sums(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    bits: int,
    counted: DataFrame | None = None,
) -> DataFrame:
    """(id, s0..s{bits-1}) signed bit votes — the shared prefix of the
    string and integer SimHash forms. ``counted`` (a precomputed
    ``token_counts`` relation) skips the tokenize+count stage.

    bits ≤ 32 is a HARD limit: bit j votes by hex digit j of
    md5(token), and md5 has exactly 32 hex chars — substring past
    them returns '' whose ascii() is 0, so bits 32+ would silently
    vote -1 always and every fingerprint would share a constant
    suffix, halving apparent hamming distances (code-review r6)."""
    if not 1 <= bits <= 32:
        raise ValueError(f"simhash bits must be in [1, 32], got {bits}")
    if counted is None:
        counted = token_counts(df, text_col, id_col)
    counted = counted.withColumn("h", F.md5("tok"))
    aggs = [
        F.sum(
            F.col("cnt") * ((F.ascii(F.substring("h", j + 1, 1)) % 2) * 2 - 1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    return counted.groupBy(id_col).agg(*aggs)


def simhash(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    counted: DataFrame | None = None,
) -> DataFrame:
    """SimHash fingerprint: for bit j, each token votes ±1 by the
    parity of hex digit j of md5(token); the bit is 1 iff the weighted
    sum is positive. Emitted as a `bits`-char '0'/'1' string (portable
    across engines — no 64-bit unsigned headaches). Token multiplicity
    is the weight (tokens are NOT deduped first). Pass ``counted`` (a
    ``token_counts`` relation) to share the tokenize+count prefix with
    the other SimHash variants."""
    summed = _simhash_sums(df, text_col, id_col, bits, counted=counted)
    bit_cols = [
        F.when(F.col(f"s{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(bits)
    ]
    return summed.select(id_col, F.concat(*bit_cols).alias("simhash"))


def simhash_int(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    counted: DataFrame | None = None,
) -> DataFrame:
    """SimHash as a bigint (bit j of the string form is worth
    2^(bits-1-j)), so hamming distance is ``bit_count(a ^ b)`` —
    the arithmetic is identical in Spark and DuckDB."""
    summed = _simhash_sums(df, text_col, id_col, bits, counted=counted)
    val = sum(
        (
            F.when(F.col(f"s{j}") > 0, F.lit(1)).otherwise(F.lit(0))
            * F.lit(2 ** (bits - 1 - j)).cast("bigint")
        )
        for j in range(bits)
    )
    return summed.select(id_col, val.alias("sh"))


# Wide fingerprint for hamming search: 60 bits (15 md5 hex digits x 4
# bits each) so the 4 exactness bands are 15 bits wide — 32768-value
# buckets instead of the 32-bit form's 256, which on clustered
# natural-language simhashes is the difference between near-linear
# candidate counts and a Sigma-|bucket|^2 blowup (measured at sf0.1:
# 4.1M collision pairs with 8-bit bands vs ~true-dups-only with
# 15-bit). 60 (not 64) keeps the value inside a signed bigint.
SIMHASH_HAM_BITS = 60
SIMHASH_HAM_BANDS = 4


def _hex_digit_expr(i: int) -> str:
    """Value 0-15 of 1-based hex char ``i`` of column ``h`` — ascii
    arithmetic only, expressible identically in Spark and DuckDB."""
    a = f"ascii(substring(h, {i}, 1))"
    return f"(CASE WHEN {a} < 97 THEN {a} - 48 ELSE {a} - 87 END)"


def simhash_wide(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_HAM_BITS,
    counted: DataFrame | None = None,
) -> DataFrame:
    """SimHash over ``bits`` <= 128 bits as a bigint (bits <= 62):
    bit j's ±1 vote comes from bit (j mod 4) of md5 hex digit (j div
    4) — consuming 4 bits per hex char instead of the string form's
    1-bit-per-char parity, so fingerprints wide enough for fine
    banding still fit one md5. Pass ``counted`` to share the
    tokenize+count prefix across the SimHash family.

    bits ≤ 62: the fingerprint packs into a signed bigint
    (2^(bits-1) must fit a long), and 62 × 4-bit reads stay inside
    md5's 32 hex chars. Unvalidated, bits=64 silently overflowed the
    F.lit power (code-review r6)."""
    if not 1 <= bits <= 62:
        raise ValueError(f"simhash_wide bits must be in [1, 62], got {bits}")
    n_digits = (bits + 3) // 4
    if counted is None:
        counted = token_counts(df, text_col, id_col)
    counted = counted.withColumn("h", F.md5("tok"))
    # Materialize the hex-digit VALUES once as int columns, then every
    # bit vote is two integer ops — evaluating the string extraction
    # inside each of the `bits` aggregates would do ~12x the work per
    # row and compile a far larger codegen method.
    digits = counted.select(
        id_col,
        "cnt",
        *[
            F.expr(_hex_digit_expr(i + 1)).alias(f"d{i}")
            for i in range(n_digits)
        ],
    )
    aggs = []
    for j in range(bits):
        i, k = j // 4, j % 4
        aggs.append(
            F.sum(
                F.col("cnt") * F.expr(f"(((d{i} div {2 ** k}) % 2) * 2 - 1)")
            ).alias(f"s{j}")
        )
    summed = digits.groupBy(id_col).agg(*aggs)
    val = sum(
        (
            F.when(F.col(f"s{j}") > 0, F.lit(1)).otherwise(F.lit(0))
            * F.lit(2 ** (bits - 1 - j)).cast("bigint")
        )
        for j in range(bits)
    )
    return summed.select(id_col, val.alias("sh"))


def simhash_hamming_pairs(
    df: DataFrame | None = None,
    max_hamming: int = 3,
    bands: int = SIMHASH_HAM_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_HAM_BITS,
    counted: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """ALL pairs with SimHash hamming distance <= ``max_hamming``,
    found scalably by band bucketing (Manku et al.'s web-dedup
    scheme): split the ``bits``-bit fingerprint into ``bands`` equal
    slices and equi-join docs sharing ANY slice; by pigeonhole a pair
    differing in <= bands-1 bits must agree on at least one whole
    slice, so for max_hamming <= bands-1 the banded retrieval is
    EXACT, not approximate — the self-join on (band_id, band_val)
    replaces the all-pairs hamming scan the same way MinHash banding
    replaces the all-pairs Jaccard scan. Band width (bits/bands)
    controls bucket granularity: 15-bit bands give 32768-value
    buckets, keeping Sigma-|bucket|^2 verification work near-linear
    even on topically-clustered corpora.

    Requires max_hamming < bands (else retrieval would miss pairs).
    Returns (doc_a, doc_b, hamming), doc_a < doc_b."""
    if max_hamming >= bands:
        raise ValueError(
            f"banded retrieval is only exact for max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    if bits % bands:
        raise ValueError(f"bands={bands} must divide bits={bits}")
    width = bits // bands
    if sig is None:
        sig = simhash_wide(df, text_col, id_col, bits, counted=counted)
    # Carry sh through the band rows so verification needs NO join
    # back to the fingerprint relation — otherwise the whole
    # tokenize→32-agg pipeline sits under three plan branches (bands
    # + both verification sides) and runs up to three times.
    stack_args = ", ".join(
        f"{b}, (sh div {2 ** (width * b)}) % {2 ** width}"
        for b in range(bands)
    )
    band_df = sig.selectExpr(
        id_col, "sh", f"stack({bands}, {stack_args}) AS (band_id, band_val)"
    )
    a = band_df.select(
        F.col(id_col).alias("doc_a"),
        F.col("sh").alias("sh_a"),
        "band_id",
        "band_val",
    )
    b = band_df.select(
        F.col(id_col).alias("doc_b"),
        F.col("sh").alias("sh_b"),
        "band_id",
        "band_val",
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        # filter BEFORE the pair-dedup so the distinct only sees
        # near-dups, not every band collision
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine >= threshold.

    Blocked all-pairs: vectors are packed into id-range blocks, block
    pairs fan out as rows, and each task scores one block pair with a
    vectorized numpy matmul (BLAS) inside ``mapInPandas`` — orders of
    magnitude faster than per-pair expression folds, and the task
    granularity (block pair) is exactly what scales out: n/B × n/B
    tasks, each O(B²·d) flops and O(B·d) memory.

    The cosine is rounded to 9 decimals: BLAS accumulation order
    differs from a sequential fold by ~1 ulp, and the rounding makes
    the result reproducible across engines (the DuckDB oracle rounds
    identically). At 100 TB don't run this unbucketed — LSH-bucket
    first (similarity.ann_lsh_topk) and apply this exact scorer within
    buckets."""
    import numpy as np
    import pandas as pd

    v = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> cast(x AS double))").alias("v"),
    ).withColumn("block", F.floor(F.col("vid") / block_size))
    packed = v.groupBy("block").agg(
        F.collect_list(F.struct("vid", "v")).alias("items")
    )
    a = packed.select(
        F.col("block").alias("block_a"), F.col("items").alias("items_a")
    )
    b = packed.select(
        F.col("block").alias("block_b"), F.col("items").alias("items_b")
    )
    block_pairs = a.crossJoin(b).where(F.col("block_a") <= F.col("block_b"))

    def score(batches):
        for pdf in batches:
            outs = []
            for items_a, items_b in zip(pdf["items_a"], pdf["items_b"]):
                ids_a = np.array([r["vid"] for r in items_a], dtype=np.int64)
                ids_b = np.array([r["vid"] for r in items_b], dtype=np.int64)
                A = np.array([r["v"] for r in items_a], dtype=np.float64)
                B = np.array([r["v"] for r in items_b], dtype=np.float64)
                na = np.sqrt((A * A).sum(axis=1))
                nb = np.sqrt((B * B).sum(axis=1))
                cos = (A @ B.T) / np.outer(na, nb)
                ia, ib = np.nonzero(
                    (cos >= threshold) & (ids_a[:, None] < ids_b[None, :])
                )
                if len(ia):
                    outs.append(
                        pd.DataFrame(
                            {
                                "vec_a": ids_a[ia],
                                "vec_b": ids_b[ib],
                                "cosine": np.round(cos[ia, ib], 9),
                            }
                        )
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
            )

    return block_pairs.mapInPandas(
        score, schema="vec_a bigint, vec_b bigint, cosine double"
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs → dedup clusters:
    (node, cluster_id) with cluster_id = min node id in the component.

    Iterative min-label propagation: each round every node takes the
    min of its own and its neighbors' labels; converges in O(graph
    diameter) rounds (near-dup clusters are shallow — duplicates of a
    common source — so this is typically 2-4 rounds). Each round is
    ONE Spark job: the propagate join/groupBy carries the previous
    label through the aggregation (``old_label``, via a marker column
    on the union — no extra join), the convergence count rides the
    same job as an ``Observation`` on the checkpoint action, and
    ``localCheckpoint`` cuts lineage. Fusing the probe halves the
    per-round job count, which is what dominates CC wall time when
    per-job scheduling overhead is large relative to the data (small
    SFs locally; many-round graphs on a busy cluster scheduler).
    This is the iterative-algorithm case the oracle covers with a
    recursive CTE.
    """
    from pyspark.sql import Observation

    und = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    und = und.distinct().cache()

    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )

    def propagate(lbls: DataFrame) -> DataFrame:
        # (node, label, old_label): own rows are marked so the
        # aggregation can recover each node's previous label in the
        # same pass (every node has exactly one own row, so
        # min-over-marked IS the old label).
        own = lbls.select(
            "node", "label", F.lit(True).alias("is_own")
        )
        neighbor_labels = und.join(
            lbls, und.dst == lbls.node
        ).select(
            F.col("src").alias("node"),
            "label",
            F.lit(False).alias("is_own"),
        )
        return (
            own.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_own"), F.col("label"))).alias(
                    "old_label"
                ),
            )
        )

    def compress(lbls: DataFrame) -> DataFrame:
        # Pointer jumping: each node also adopts its LABEL's label,
        # doubling the hop distance covered per round — O(log diameter)
        # convergence on deep graphs.  old_label passes through so the
        # fused convergence probe still sees the pre-round label.
        via = lbls.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        return (
            lbls.join(via, lbls.label == via.pnode, "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("label"), F.coalesce("plabel", "label")
                ).alias("label"),
            )
        )

    # Rounds 0-2 are plain one-hop propagation: near-dup graphs are
    # shallow (duplicates of a common source) and converge here, and
    # the extra compression join measurably loses on them (the earlier
    # two-hop experiment: 6.6s vs 4.4s at sf0.1).  From round 3 on,
    # compression kicks in so a diameter-D component needs only
    # ~3 + log2(D) rounds instead of D — max_iters=25 then covers any
    # graph that fits in storage, and exhaustion is a hard error, not
    # a silent wrong answer.
    compress_after = 3
    converged = False
    for i in range(max_iters):
        new_labels = propagate(labels)
        if i >= compress_after:
            new_labels = compress(new_labels)
        # Convergence count fused into the materialization job: the
        # Observation's sum rides the same physical plan as the
        # checkpoint (verified: metrics ARE published by the
        # localCheckpoint action, including on empty relations), so a
        # round is one job, not checkpoint + probe-join.
        obs = Observation()
        probed = new_labels.observe(
            obs,
            F.coalesce(
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ),
                F.lit(0),
            ).alias("n_changed"),
        )
        # localCheckpoint (not cache): compression references the
        # previous round TWICE, so the logical plan would double every
        # round — lineage must be CUT, not just the computation
        # memoized, or plan analysis itself OOMs after ~10 rounds.  On
        # a fault-tolerant cluster run, swap for reliable checkpoint()
        # with a checkpoint dir (localCheckpoint dies with an executor).
        new_labels = probed.drop("old_label").localCheckpoint(eager=True)
        changed = obs.get["n_changed"]
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
