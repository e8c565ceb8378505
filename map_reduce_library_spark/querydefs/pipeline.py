"""Pipeline data-prep queries with md5-deterministic oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.pipeline import (
    chunk_documents,
    class_balanced_topn,
    decontamination_overlap,
    deterministic_split,
    oov_rate,
    pack_sequences,
    stratified_sample,
    temperature_mix_weights,
    vocab_topn,
)
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

# Salted per purpose, mirroring operators/pipeline.py::hash_bucket —
# unsalted, every hash-derived selection correlates perfectly.
_SPLIT_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15))"
    "::BIGINT % 100)"
)
_STRAT_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 15))"
    "::BIGINT % 100)"
)

SAMPLE_RATES = {"en": 50, "de": 20, "es": 10}
PACK_BUDGET = 2048


@register(
    "deterministic_split_counts",
    oracle=f"""
    SELECT split, count(*) AS n FROM (
      SELECT CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train'
                  WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split
    """,
)
def deterministic_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 split (hash-derived, re-run-safe); counts per
    split checked against the oracle's identical md5 arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_STRAT_BUCKET_SQL} < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                                          WHEN 'es' THEN 10 ELSE 0 END
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling (50%/20%/10%, drop rest) —
    a pure filter, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, SAMPLE_RATES, "lang").select("doc_id", "lang")


BALANCE_N = 100
DECON_N = 8
EVAL_SET_MAX_ID = 50
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@register(
    "document_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id,
             unnest([{{'idx': s // {CHUNK_STRIDE},
                      'n': least({CHUNK_SIZE}, len(toks) - s),
                      'first': toks[s + 1]}}
                     FOR s IN generate_series(0, greatest(len(toks)-1, 0),
                                              {CHUNK_STRIDE})]) AS ch
      FROM t
    )
    SELECT doc_id, ch.idx AS chunk_idx,
           CAST(ch.n AS BIGINT) AS chunk_tokens,
           ch.first AS first_token
    FROM c
    """,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunker (CHUNK_SIZE=64-token windows
    every CHUNK_STRIDE=48 tokens) — the retrieval-indexing / long-doc
    split step, computed as a zero-shuffle scan projection."""
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), CHUNK_SIZE, CHUNK_STRIDE
    )


@register(
    "class_balanced_sample",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || ':class'),
                                         doc_id)
               AS rn
      FROM documents
    ) WHERE rn <= {BALANCE_N}
    """,
)
def class_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing: cap every language at
    BALANCE_N=100 documents, picked by smallest md5(id) — a stable
    'random' subset that is reproducible across re-runs over the same
    data (rank follows the content hash, not arrival order; corpus
    growth can still evict prior picks — see class_balanced_topn)."""
    docs = load_table(spark, sf_dir, "documents")
    return class_balanced_topn(docs, "lang", BALANCE_N).select(
        "doc_id", "lang"
    )


_DECON_SHINGLES = f"""
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest([md5({'||'.join(f"toks[i+{j}]" + ("||' '" if j < DECON_N - 1 else "") for j in range(DECON_N))})
                 FOR i IN generate_series(1, greatest(len(toks)-{DECON_N - 1}, 0))]) AS sh
  FROM tok
)"""


@register(
    "decontamination_overlap",
    oracle=f"""
    WITH {_DECON_SHINGLES}
    SELECT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id,
           count(*) AS n_shared
    FROM sh t JOIN sh e ON t.sh = e.sh
    WHERE t.doc_id >= {EVAL_SET_MAX_ID} AND e.doc_id < {EVAL_SET_MAX_ID}
    GROUP BY 1, 2
    """,
)
def decontamination_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train documents (doc_id >=
    EVAL_SET_MAX_ID=50) sharing any distinct word DECON_N=8-gram with
    the eval set (doc_id < 50) — the pre-training overlap sweep
    against eval suites. n=8 shingles are near-unique, so the
    md5-shingle equi-join has tiny fan-out and linear total work."""
    docs = load_table(spark, sf_dir, "documents")
    return decontamination_overlap(
        docs.where(F.col("doc_id") >= EVAL_SET_MAX_ID),
        docs.where(F.col("doc_id") < EVAL_SET_MAX_ID),
        n=DECON_N,
    )


# Fuzzy decon oracle: the minhash fragment generators live in the
# _fragments LEAF module (they regenerate the identical universal-hash
# family both engines run) — importing a sibling querydef for them
# would recreate the circular-import crash _fragments exists to
# prevent (queries.py imports pipeline BEFORE dedup, so a direct
# `import querydefs.dedup` would re-enter dedup through pipeline
# before the fragment names exist; tests/test_direct_imports.py).
from map_reduce_library_spark.operators.pipeline import (  # noqa: E402
    DECON_FUZZY_BANDS,
    DECON_FUZZY_K,
    DECON_FUZZY_ROWS,
    fuzzy_decontamination,
)
from map_reduce_library_spark.querydefs._fragments import (  # noqa: E402
    MINHASH_SHINGLE_CTE as _SHINGLE_CTE,
    MINHASH_SHX_CTE as _SHX_CTE,
    band_selects_sql as _band_selects_sql,
    minhash_aggs_sql as _minhash_aggs_sql,
)

_FUZZY_EST_SQL = " + ".join(
    f"(CASE WHEN t.h{i} = e.h{i} THEN 1 ELSE 0 END)"
    for i in range(DECON_FUZZY_K)
)


@register(
    "decontamination_fuzzy",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SHX_CTE},
    sig AS (SELECT doc_id, {_minhash_aggs_sql(DECON_FUZZY_K)}
            FROM shx GROUP BY doc_id),
    bands AS ({_band_selects_sql(DECON_FUZZY_BANDS, DECON_FUZZY_ROWS)}),
    cand AS (
      SELECT DISTINCT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id
      FROM bands t JOIN bands e
        ON t.band_id = e.band_id AND t.band_sig = e.band_sig
      WHERE t.doc_id >= {EVAL_SET_MAX_ID} AND e.doc_id < {EVAL_SET_MAX_ID}
    )
    SELECT c.train_doc_id, c.eval_doc_id,
           ({_FUZZY_EST_SQL}) / {float(DECON_FUZZY_K)} AS est_jaccard
    FROM cand c
    JOIN sig t ON t.doc_id = c.train_doc_id
    JOIN sig e ON e.doc_id = c.eval_doc_id
    """,
)
def decontamination_fuzzy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination (VERDICT r10 item 5): train docs (doc_id
    >= 50) MinHash-colliding with the eval set (doc_id < 50) on word
    3-gram shingles, with the matching-components/K Jaccard estimate —
    the paraphrase-leakage complement to the exact 8-gram
    ``decontamination_overlap``. Recall-first geometry (6 bands × 2
    rows, knee ≈ 0.41 Jaccard); the oracle regenerates the identical
    12-permutation universal-hash family and the band reshape, so the
    differential covers the full estimator, not just the candidates."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_decontamination(
        docs.where(F.col("doc_id") >= EVAL_SET_MAX_ID),
        docs.where(F.col("doc_id") < EVAL_SET_MAX_ID),
    )


@register(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT lang, CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS seq_bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens
    FROM c GROUP BY 1, 2
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of documents into PACK_BUDGET=2048
    token training sequences per language; reports docs/tokens per
    bin. Oracle note: DuckDB SUM over BIGINT yields HUGEINT, which
    the driver's hasher renders differently from Spark's bigint, so
    the oracle CASTs the sum back to BIGINT."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    packed = pack_sequences(
        docs, "n_tokens", PACK_BUDGET, order_col="doc_id", group_col="lang"
    )
    return packed.groupBy("lang", "seq_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
    )


VOCAB_N = 1000
MIX_ALPHA = 0.7


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    vocab AS (SELECT tok FROM cnt ORDER BY cnt DESC, tok LIMIT {VOCAB_N})
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN t.tok IN (SELECT tok FROM vocab)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN t.tok IN (SELECT tok FROM vocab)
                          THEN 0 ELSE 1 END) / CAST(count(*) AS DOUBLE),
                 9) AS oov_rate
    FROM tok t GROUP BY doc_id
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + coverage: top-VOCAB_N=1000 tokens by corpus
    frequency (deterministic tie-break), then per-document
    out-of-vocabulary rate against it — the tokenizer-coverage sweep a
    pretraining pipeline runs before committing a vocab. The vocab is
    a broadcast-joined top-N (TakeOrderedAndProject); the document
    pass is one scan + one per-doc groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    return oov_rate(docs, vocab_topn(docs, VOCAB_N))


@register(
    "temperature_mix",
    oracle=f"""
    WITH lc AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT sum(pow(n_docs, {MIX_ALPHA})) AS z FROM lc)
    SELECT lang, n_docs, round(pow(n_docs, {MIX_ALPHA}) / z, 9) AS weight
    FROM lc CROSS JOIN tot
    """,
)
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language-mix weights (alpha=0.7): the
    standard multilingual upsampling curve (p^alpha / sum p^alpha).
    Grand total attaches via the approved single-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix_weights(docs, "lang", MIX_ALPHA)


@register(
    "chunk_level_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id,
             unnest([{{'idx': s // {CHUNK_STRIDE},
                      'h': md5(array_to_string(
                             toks[s + 1 : s + {CHUNK_SIZE}], ' '))}}
                     FOR s IN generate_series(0, greatest(len(toks)-1, 0),
                                              {CHUNK_STRIDE})]) AS ch
      FROM t
    )
    SELECT ch.h AS chunk_hash,
           count(*) AS n_copies,
           min(doc_id) AS first_doc
    FROM c
    GROUP BY ch.h
    HAVING count(*) >= 2
    """,
)
def chunk_level_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk/paragraph-level exact dedup: md5 every overlapping
    64-token window (zero-shuffle scan projection — only 32-byte
    hashes leave the scan), then one hash-groupBy finds windows
    repeated ACROSS documents — the within-corpus boilerplate sweep
    (headers, licenses, templates) that document-level dedup misses.
    The RefinedWeb/CCNet line-level-dedup step at window granularity."""
    from map_reduce_library_spark.operators.pipeline import chunk_hashes

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_hashes(docs, CHUNK_SIZE, CHUNK_STRIDE)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_copies") >= 2)
    )


WEIGHTED_SAMPLE_N = 20


@register(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
           round(ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 15))::BIGINT + 1)
                        / 1152921504606846977.0))
                 - ln(CAST(n_chars AS DOUBLE)), 9) AS es_key
    FROM documents
    WHERE CAST(n_chars AS DOUBLE) > 0
    ORDER BY es_key, doc_id
    LIMIT {WEIGHTED_SAMPLE_N}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample (A-ES exponential-jitter
    keys from md5 uniforms): longer documents are proportionally more
    likely to be picked, picks are stable under re-runs and corpus
    growth. TakeOrderedAndProject cut, key rounded before ranking."""
    from map_reduce_library_spark.operators.pipeline import (
        weighted_sample_topn,
    )

    return weighted_sample_topn(
        load_table(spark, sf_dir, "documents"),
        F.col("n_chars"),
        WEIGHTED_SAMPLE_N,
    )


@register(
    "sequence_packing_efficiency",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
      FROM t
    ),
    bins AS (
      SELECT lang,
             CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT)
               AS seq_bin,
             CAST(SUM(n_tokens) AS BIGINT) AS fill
      FROM c GROUP BY 1, 2
    )
    SELECT lang, count(*) AS n_bins,
           round(avg(fill / CAST({PACK_BUDGET} AS DOUBLE)), 6) AS avg_fill,
           CAST(sum(CASE WHEN fill >= {PACK_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_full
    FROM bins GROUP BY 1
    """,
)
def sequence_packing_efficiency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shard-efficiency report over ``sequence_packing``'s bins: bins
    per language, mean fill ratio against the PACK_BUDGET, and how
    many bins are at/over budget (a doc belongs to the bin where its
    span STARTS, so bins legitimately overflow by up to one doc —
    the metric a packing pipeline watches to choose budget vs
    truncation). Fill ratios are dyadic rationals (denominator 2^11),
    so the double avg is exact regardless of partition order; the
    round(6) is belt only. Same single window shuffle as
    sequence_packing, then two partial-agged groupBys."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    packed = pack_sequences(
        docs, "n_tokens", PACK_BUDGET, order_col="doc_id", group_col="lang"
    )
    bins = packed.groupBy("lang", "seq_bin").agg(
        F.sum("n_tokens").alias("fill")
    )
    return bins.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(
            F.avg(F.col("fill") / F.lit(float(PACK_BUDGET))), 6
        ).alias("avg_fill"),
        F.sum(
            F.when(F.col("fill") >= PACK_BUDGET, 1).otherwise(0)
        ).cast("bigint").alias("n_full"),
    )
