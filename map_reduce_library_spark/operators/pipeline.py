"""Training-data pipeline operators: deterministic splits, stratified
sampling, and sequence packing.

All randomness is hash-derived (md5 of the stable id), never
``rand()``: a 100-TB pipeline re-run after a failure must assign every
document to the same split/sample, and an added document must not
reshuffle existing assignments. md5 is used (not xxhash64) so the
DuckDB oracle reproduces assignments exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_reduce_library_spark.operators.hashing import md5_prefix60


def hash_bucket(
    col: str | Column, buckets: int = 100, salt: str = ""
) -> Column:
    """Deterministic uniform bucket in [0, buckets): top 60 bits of
    md5(id || salt) mod buckets. Identical in DuckDB:
    ``('0x' || substr(md5(x || salt), 1, 15))::BIGINT % buckets``.

    ``salt`` makes INDEPENDENT selections composable: every sampling/
    split operator in this module hashes the same id, so without
    per-purpose salts their selections are perfectly correlated —
    e.g. a 10% unsalted sample keeps exactly buckets 0-9, and a
    downstream unsalted 80/10/10 split then lands EVERY sampled row
    in 'train' (code-review r6 finding). Each operator below bakes in
    its own salt; the default empty salt keeps ad-hoc bucketing (test
    tick splits etc.) byte-stable with prior rounds."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        md5_prefix60(F.concat(c.cast("string"), F.lit(salt))) % buckets
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Stable train/val/test assignment (train/val/100-train-val).
    Salted ':split' so composition with the sampling operators stays
    independent (see hash_bucket)."""
    b = hash_bucket(id_col, salt=":split")
    return df.withColumn(
        "split",
        F.when(b < train, "train")
        .when(b < train + val, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str,
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls under the stratum's percentage. No shuffle at all —
    a pure filter, the only sane sampling at 100 TB. Salted ':strat'
    for independence from the other hash-derived selections."""
    b = hash_bucket(id_col, salt=":strat")
    pct = F.lit(default_pct)
    expr = None
    for value, p in rates.items():
        cond = F.col(strata_col) == value
        expr = F.when(cond, p) if expr is None else expr.when(cond, p)
    pct = expr.otherwise(default_pct) if expr is not None else pct
    return df.where(b < pct)


def class_balanced_topn(
    df: DataFrame,
    class_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic class rebalancing: keep the ``n`` rows per class
    with the smallest md5(id) — a stable 'random' sample that caps
    every class at the same size (the standard fix for dominant-class
    skew in a pretraining mix). One shuffle (the per-class window);
    re-runs over the SAME data are deterministic because rank follows
    the content hash, not arrival order. Note: corpus growth can still
    evict prior picks — a new row whose md5 ranks inside the top-n
    displaces the old rank-n row; only identical inputs guarantee
    identical outputs. Salted ':class': unsalted, 'smallest md5'
    preferentially keeps the same rows every other unsalted selection
    keeps (see hash_bucket)."""
    w = Window.partitionBy(class_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":class"))),
        F.col(id_col),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def decontamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: (train_doc, eval_doc, n_shared)
    pairs sharing >= ``min_overlap`` distinct word ``n``-grams — the
    overlap check every serious pretraining pipeline runs against its
    eval suites before training. With n >= 8 the shingles are
    near-unique, so the equi-join on the shingle hash has tiny
    fan-out (unlike dedup's n=3 shingles) and total work is linear in
    corpus tokens; the eval side is typically small enough to
    broadcast. Join on md5(shingle) to keep shuffle keys fixed-width
    (32 bytes) regardless of n."""
    from map_reduce_library_spark.operators.dedup import shingles

    t = shingles(train, text_col, id_col, n=n).select(
        F.col(id_col).alias("train_doc_id"),
        F.md5("shingle").alias("sh"),
    )
    e = shingles(eval_df, text_col, id_col, n=n).select(
        F.col(id_col).alias("eval_doc_id"),
        F.md5("shingle").alias("sh"),
    )
    return (
        t.join(e, "sh")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )


# Fuzzy-decon LSH geometry: RECALL-first, unlike the near-dup
# production geometry (16 bands × 8 rows, knee ≈ 0.71 Jaccard).
# Decontamination is a safety check — a missed paraphrased eval doc
# poisons an eval suite, while a false candidate merely costs one
# verification — so the knee sits low: 6 bands × 2 rows puts the
# 50%-detection point at t = (1/6)^(1/2) ≈ 0.41 Jaccard, and the
# est_jaccard column (the standard matching-components/K estimator)
# lets the caller threshold precisely ABOVE the generous candidate
# net. K stays 12: one md5 per shingle, 12 integer permutations.
DECON_FUZZY_K = 12
DECON_FUZZY_BANDS = 6
DECON_FUZZY_ROWS = 2


def fuzzy_decontamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    k: int = DECON_FUZZY_K,
    bands: int = DECON_FUZZY_BANDS,
    rows: int = DECON_FUZZY_ROWS,
    min_est_jaccard: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_shingles: DataFrame | None = None,
    eval_shingles: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy decontamination (VERDICT r10 item 5): train docs whose
    word ``n``-gram shingle sets are MinHash-near an eval doc —
    (train_doc_id, eval_doc_id, est_jaccard). The standard production
    complement to exact ``decontamination_overlap``: Brown-et-al-style
    n-gram decon catches verbatim leakage; a PARAPHRASED eval doc
    shares almost no 8-gram but most of its 3-gram shingles, so only
    the Jaccard path sees it (``tests/test_pipeline_ops.py`` plants
    exactly that miss/hit pair).

    Shape at 100 TB: eval suites are small (10³-10⁵ docs), so the
    eval band relation and eval signatures BROADCAST; the train side
    is one shingle scan + one signature groupBy (K integer mins over
    one md5 per shingle — ``minhash_signature``), and the candidate
    join is banded-LSH bucketed, never all-pairs. est_jaccard is the
    matching-components/K estimator computed only on candidates.

    ``train_shingles``/``eval_shingles`` forward precomputed (id,
    shingle) relations (the shared-checkpoint pattern of
    ``minhash_lsh_pairs``)."""
    from map_reduce_library_spark.operators.dedup import (
        lsh_bands,
        minhash_signature,
        shingles,
    )

    if train_shingles is None:
        train_shingles = shingles(train, text_col, id_col, n, distinct=False)
    if eval_shingles is None:
        eval_shingles = shingles(eval_df, text_col, id_col, n, distinct=False)
    sig_t = minhash_signature(train_shingles, id_col, k)
    sig_e = minhash_signature(eval_shingles, id_col, k)
    bt = lsh_bands(sig_t, id_col, bands, rows).select(
        F.col(id_col).alias("train_doc_id"), "band_id", "band_sig"
    )
    be = lsh_bands(sig_e, id_col, bands, rows).select(
        F.col(id_col).alias("eval_doc_id"), "band_id", "band_sig"
    )
    cand = (
        bt.join(F.broadcast(be), ["band_id", "band_sig"])
        .select("train_doc_id", "eval_doc_id")
        .distinct()
    )
    sig_e_r = F.broadcast(
        sig_e.select(
            F.col(id_col).alias("eval_doc_id"),
            *[F.col(f"h{i}").alias(f"g{i}") for i in range(k)],
        )
    )
    matches = sum(
        F.when(F.col(f"h{i}") == F.col(f"g{i}"), 1).otherwise(0)
        for i in range(k)
    )
    return (
        cand.join(sig_t.withColumnRenamed(id_col, "train_doc_id"),
                  "train_doc_id")
        .join(sig_e_r, "eval_doc_id")
        .select(
            "train_doc_id",
            "eval_doc_id",
            (matches / F.lit(float(k))).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= min_est_jaccard)
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Greedy sequential packing of documents into fixed token-budget
    training sequences: documents are laid out in ``order_col`` order
    (within ``group_col`` if given) and a document belongs to the bin
    where its span STARTS (bin = floor(preceding-tokens / budget)) —
    the contiguous-stream packing used for LLM pretraining shards.
    Pass a UNIQUE ``order_col`` (the doc_id default is) for a fully
    deterministic layout; with a non-unique key (e.g. a timestamp)
    the tokens_col tie-break still pins the bin arithmetic but equal
    (key, tokens) rows may swap positions between runs.

    One window cumsum = one shuffle on the group key; bins never span
    groups, so shards can be written partitioned by (group, bin).

    SCALE WARNING: ``group_col=None`` (and any low-cardinality group)
    plans an UNPARTITIONED window — the whole dataset (or group)
    funnels through one task. That is fine for a bounded relation; at
    corpus scale pass a real sharding key (e.g. a hash_bucket-derived
    shard id, salted) so each window task holds one shard, and treat
    (shard, seq_bin) as the bin identity."""
    # ROWS frame + unique tie-break, both load-bearing: the default
    # window frame is RANGE, under which rows TIED on order_col each
    # see every peer's tokens in their cumulative sum — two tied
    # 10-token docs at budget=5 both land in bin 2, emitting phantom
    # empty bins and a 4x-overfilled shard (code-review r8, verified).
    # A ROWS frame makes the sum positional, and the order_col →
    # tokens_col tie-break pins WHICH total order the stream is laid
    # out in, deterministically, when order_col alone is non-unique
    # (e.g. a timestamp).
    w = (
        (
            Window.partitionBy(group_col)
            if group_col
            else Window.partitionBy()
        )
        .orderBy(order_col, tokens_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return df.withColumn(
        "seq_bin",
        F.floor((cum - F.col(tokens_col)) / budget).cast("bigint"),
    )


def _window_transform(stride: int, struct_fields: str) -> str:
    """The ONE definition of the overlapping-window start sequence
    shared by ``chunk_documents`` and ``chunk_hashes`` — their
    chunk_idx correspondence (joining hashes back onto chunk
    metadata) depends on both using byte-identical windowing, so the
    bound/stride expression must not be able to drift between them."""
    return (
        f"transform(sequence(0, greatest(size(toks)-1, 0), {stride}), "
        f"s -> named_struct({struct_fields}))"
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows of
    ``size`` tokens starting every ``stride`` tokens (stride < size →
    overlap of size-stride) — the standard chunker for retrieval
    indexing and long-document pretraining. Entirely a per-row
    expression (sequence → transform → explode): ZERO shuffles, so it
    runs at parquet-scan speed over 100 TB. Returns one row per chunk:
    (id, chunk_idx, chunk_tokens, first_token)."""
    toks = df.select(id_col, F.split(F.col(text_col), " ").alias("toks"))
    chunks = F.expr(
        _window_transform(
            stride,
            f"'idx', s div {stride}, "
            f"'n', least({size}, size(toks) - s), "
            f"'first', toks[s]",
        )
    )
    return toks.select(
        id_col, F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.idx").alias("chunk_idx"),
        F.col("c.n").cast("bigint").alias("chunk_tokens"),
        F.col("c.first").alias("first_token"),
    )


def observe_metrics(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, "Observation"]:
    """Attach named aggregate metrics to a plan via ``df.observe`` —
    they are computed DURING the next action as accumulator updates,
    costing zero extra passes over the data.  This is how a 100-TB
    pipeline stage reports row counts / null rates / quality averages
    without re-scanning its input: ``obs.get`` blocks until the first
    action finishes, then returns the metric dict.

    The reference's progress facility exposes work completed per phase
    (`/root/reference/MapReduceFramework.cpp:372-380`); ``observe`` is
    the Spark-native generalization to arbitrary per-stage aggregates.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def quality_gate_metrics(df: DataFrame, text_col: str = "text"):
    """Standard observed metrics for a document-cleaning stage: input
    rows, null/empty texts, and mean document length."""
    return observe_metrics(
        df,
        "quality_gate",
        {
            "rows": F.count(F.lit(1)),
            "null_or_empty": F.sum(
                (
                    F.col(text_col).isNull()
                    | (F.length(text_col) == 0)
                ).cast("long")
            ),
            "mean_chars": F.avg(F.length(text_col)),
        },
    )


def vocab_topn(
    df: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Top-``n`` token vocabulary by corpus frequency (ties broken by
    token string, so the cut is deterministic) — the BPE-precursor
    vocabulary-build step. The orderBy+limit plans as
    TakeOrderedAndProject over the counted relation: each task keeps
    its local top-n, the driver merges n-sized heaps — no global
    sort."""
    tok = df.select(F.explode(F.split(F.col(text_col), " ", -1)).alias("tok"))
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(n)


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a (small) vocab
    relation: (id, n_tokens, n_oov, oov_rate). The vocab side is
    broadcast (it is top-N by construction), so the scan over 100 TB
    of documents is one shuffle-free pass + the final per-doc groupBy."""
    tok = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ", -1)).alias("tok")
    )
    flagged = tok.join(
        F.broadcast(vocab.select("tok").withColumn("__in_vocab", F.lit(1))),
        "tok",
        "left",
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("__in_vocab").isNull()).cast("long")).alias("n_oov"),
        F.round(
            F.sum((F.col("__in_vocab").isNull()).cast("long"))
            / F.count(F.lit(1)),
            9,
        ).alias("oov_rate"),
    )


def temperature_mix_weights(
    df: DataFrame, class_col: str, alpha: float
) -> DataFrame:
    """Temperature-based sampling weights over a class column (the
    multilingual-mix reweighting of mBERT/XLM-R: p_l^alpha / sum
    p^alpha, alpha < 1 upsamples low-resource classes). Returns
    (class, n_docs, weight). One groupBy to class cardinality, then a
    single-row grand-total broadcast — the approved scalar-attach
    plan (constant-size build side at any scale)."""
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("n_docs"))
    z = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("z")
    )
    return counts.crossJoin(F.broadcast(z)).select(
        class_col,
        "n_docs",
        F.round(
            F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("z"), 9
        ).alias("weight"),
    )


def chunk_hashes(
    df: DataFrame,
    size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """md5 content hash of every overlapping token window (same
    windowing as ``chunk_documents``): (id, chunk_idx, chunk_hash).
    Zero-shuffle scan projection — the hash is computed inside the
    per-row transform, so the only data leaving the scan is the
    32-byte hash per chunk, never the chunk text. Feed into a
    hash-groupBy for chunk/paragraph-level dedup (the within-corpus
    boilerplate sweep line-level dedup pipelines run)."""
    toks = df.select(id_col, F.split(F.col(text_col), " ").alias("toks"))
    chunks = F.expr(
        _window_transform(
            stride,
            f"'idx', s div {stride}, "
            f"'h', md5(concat_ws(' ', slice(toks, s + 1, {size})))",
        )
    )
    return toks.select(id_col, F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.idx").alias("chunk_idx"),
        F.col("c.h").alias("chunk_hash"),
    )


def weighted_sample_topn(
    df: DataFrame,
    weight: Column,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws an exponential jitter
    key = -ln(u) / w from a HASH-derived uniform u (md5 of the id,
    never rand()), and the sample is the n smallest keys — inclusion
    probability proportional to weight, stable across re-runs,
    retries, and partitionings, and an appended row cannot reshuffle
    prior picks' keys (only displace the cut). One TakeOrdered, no
    global sort.

    The ranking key is the LOG of the A-ES key: ln(-ln(u)) - ln(w),
    a strictly monotone transform (same sample), rounded to 9 dp
    BEFORE the cut so the ln() ulp spread between engines/libms
    cannot flip the boundary. Rounding in the log domain keeps
    RELATIVE precision: the raw key -ln(u)/w is bounded by ~41.6/w,
    so with large weights (byte counts ~1e9) absolute 9-dp rounding
    collapsed all keys onto a handful of grid values and the 'sample'
    degenerated to the id tiebreaker (code-review r6 finding); the
    log key spans ~[-42, 4] at any weight scale. The uniform is
    salted ':wsample' for independence from the other hash-derived
    selections. Rows with non-positive weight are EXCLUDED — A-ES is
    defined for w > 0 (w = 0 divides by zero under ANSI; w < 0 would
    produce a key that always wins and corrupts the sample)."""
    x = md5_prefix60(
        F.concat(F.col(id_col).cast("string"), F.lit(":wsample"))
    )
    u = (x + F.lit(1)).cast("double") / F.lit(1152921504606846977.0)
    key = F.round(
        F.log(-F.log(u)) - F.log(weight.cast("double")), 9
    )
    return (
        df.where(weight.cast("double") > 0)
        .select(
            id_col,
            weight.cast("double").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").asc(), F.col(id_col))
        .limit(n)
    )
