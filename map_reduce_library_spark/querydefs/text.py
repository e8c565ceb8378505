"""Text-analysis query corpus with DuckDB oracles generated from the
same stopword lists / regex / score formula as the Spark operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from map_reduce_library_spark.operators.text import (
    BPE_ISH_PATTERN,
    doc_token_arrays,
    QF_LANG,
    QF_MAX_MEAN_TOK_LEN,
    QF_MAX_TOKENS,
    QF_MIN_MEAN_TOK_LEN,
    QF_MIN_STOP_RATIO,
    QF_MIN_TOKENS,
    QF_MIN_TTR,
    STOPWORDS,
    doc_fingerprints,
    lang_id,
    quality_filter,
    repetition_stats,
    text_stats,
    token_accounting,
)
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.querydefs._fragments import (
    LANG_ID_SQL,
    TEXT_STATS_SQL,
)
from map_reduce_library_spark.tables import load_table


# One corpus text scan+split shared by every token-derived query
# (bigram_counts, inverted_index_tokens, token_cooccurrence_pmi,
# tfidf_top_terms, bigram_perplexity_topk) — the shared_lsh_pairs
# one-write-many-reads pattern. Consumers explode/zip the CHECKPOINTED
# array column; the raw text is never re-scanned or re-split.
_SHARED_TOKS: dict = {}


def shared_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_library_spark.querydefs._shared import (
        shared_checkpoint,
    )

    return shared_checkpoint(
        _SHARED_TOKS,
        spark,
        sf_dir,
        lambda: doc_token_arrays(load_table(spark, sf_dir, "documents")),
    )


@register("text_stats", oracle=TEXT_STATS_SQL)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality stats + composite score."""
    return text_stats(load_table(spark, sf_dir, "documents"))


@register("lang_id", oracle=LANG_ID_SQL)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-ratio language ID (argmax across 4 languages)."""
    return lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
             AS bpe_ish_tokens,
           CAST(length(text) AS BIGINT) AS chars
    FROM documents
    """,
)
def token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token accounting."""
    return token_accounting(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp_exact,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fp_bag
    FROM documents
    """,
)
def doc_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + order-invariant bag fingerprints."""
    return doc_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "repetition_stats",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, toks,
             [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
              FOR i IN generate_series(1, greatest(len(toks)-2, 0))] AS g3
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           1 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
             AS dup_token_ratio,
           list_max(list_transform(list_distinct(toks),
                                   d -> len(list_filter(toks, t -> t = d))))
             / CAST(len(toks) AS DOUBLE) AS top_token_ratio,
           CASE WHEN len(g3) = 0 THEN 0.0
                ELSE 1 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE) END
             AS dup_3gram_ratio
    FROM g
    """,
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (dup tokens / mode dominance /
    dup 3-grams) as a zero-shuffle scan projection."""
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def _quality_filter_oracle() -> str:
    return f"""
    WITH ts AS ({TEXT_STATS_SQL}),
    li AS ({LANG_ID_SQL}),
    flagged AS (
      SELECT ts.doc_id, ts.n_tokens, ts.quality_score, li.pred_lang,
             concat_ws(',',
               CASE WHEN ts.n_tokens IS NULL THEN 'null' END,
               CASE WHEN NOT (ts.n_tokens
                              BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS})
                    THEN 'len' END,
               CASE WHEN NOT (ts.mean_tok_len
                              BETWEEN {QF_MIN_MEAN_TOK_LEN}
                                  AND {QF_MAX_MEAN_TOK_LEN})
                    THEN 'tok_len' END,
               CASE WHEN ts.stop_ratio < {QF_MIN_STOP_RATIO} THEN 'stop' END,
               CASE WHEN ts.ttr < {QF_MIN_TTR} THEN 'ttr' END,
               CASE WHEN li.pred_lang != '{QF_LANG}' THEN 'lang' END)
               AS fail_reasons
      FROM ts JOIN li ON ts.doc_id = li.doc_id
    )
    SELECT doc_id, n_tokens, quality_score, pred_lang, fail_reasons,
           (fail_reasons = '') AS keep
    FROM flagged
    """


@register("quality_filter_docs", oracle=_quality_filter_oracle())
def quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style corpus filter verdicts: per-doc keep/drop with
    a fail-reason audit trail — the composition every pretraining
    pipeline runs after per-doc stats. Oracle composes the text_stats
    and lang_id oracles the same way the Spark plan composes the
    operators."""
    return quality_filter(load_table(spark, sf_dir, "documents"))


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * ln(n.n_docs / dfreq.df) AS score
      FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, tok) AS rn
      FROM scored
    )
    SELECT doc_id, tok AS top_term, round(score, 9) AS tfidf
    FROM ranked WHERE rn = 1
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency x inverse document frequency, reporting
    each document's most distinctive term. df comes from one extra
    groupBy; idf joins back via broadcast (vocabulary ≪ corpus)."""
    from pyspark.sql.window import Window

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    tok = shared_doc_tokens(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # Corpus size rides a one-row broadcast (the scalar-attach
    # convention — bm25's n_rel, PMI's n_docs) instead of an eager
    # count() action at plan-build time: queries() callables are
    # lazy-build by contract, and a build-time job would also execute
    # outside anything the bench times.
    n_rel = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_rel))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_term"),
            F.round("score", 9).alias("tfidf"),
        )
    )


# ---- PII scrubbing -------------------------------------------------------
# The synthetic corpus contains no digits at all (checked at sf0.01),
# so a redaction query over raw text would be a no-op and its oracle
# green would prove nothing. Instead both engines deterministically
# "dirty" every document with doc_id-derived PII (an email, a dotted
# IPv4, a 7-digit reference number) and redact THAT — the cross-engine
# hash then genuinely pins Java-regex vs RE2 match semantics for the
# three patterns, plus the email->ip->longnum ordering contract.

_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4_SQL = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
_PII_LONGNUM_SQL = "\\d{6,}"

_DIRTY_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 100 AS VARCHAR)"
    " || ' ref ' || CAST(1000000 + doc_id AS VARCHAR)"
)


@register(
    "pii_redaction",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id, {_DIRTY_SQL} AS text FROM documents
    ),
    s1 AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS n_emails,
             regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g') AS t1
      FROM dirty
    ),
    s2 AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(t1, '{_PII_IPV4_SQL}')) AS n_ips,
             regexp_replace(t1, '{_PII_IPV4_SQL}', '<IP>', 'g') AS t2
      FROM s1
    )
    SELECT doc_id, n_emails, n_ips,
           len(regexp_extract_all(t2, '{_PII_LONGNUM_SQL}')) AS n_longnums,
           regexp_replace(t2, '{_PII_LONGNUM_SQL}', '<NUM>', 'g') AS redacted
    FROM s2
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a deterministically dirtied corpus: redact
    emails, IPv4s, and 6+-digit runs with typed placeholders and count
    each class (see operators.text.pii_redact for the ordering
    contract)."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.text import pii_redact

    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" ref "),
            (F.lit(1000000) + F.col("doc_id")).cast("string"),
        ).alias("text"),
    )
    return pii_redact(dirty)


@register(
    "source_lang_mix",
    oracle="""
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 9)
             AS doc_share
    FROM documents GROUP BY source, lang
    """,
)
def source_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per (source, lang): doc counts, char
    volume, and each cell's share of the corpus — the mix table every
    training-data pipeline reports before weighting. One partial-agg
    groupBy plus a scalar total via a window over the aggregated
    (tiny) result — no second scan of the corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        F.round(
            F.col("n_docs")
            / F.sum("n_docs").over(Window.partitionBy()).cast("double"),
            9,
        ).alias("doc_share"),
    )


# ---- BM25 retrieval ------------------------------------------------------

from map_reduce_library_spark.operators.text import BM25_QUERY_TERMS  # noqa: E402

BM25_TOPK = 10


def _bm25_oracle() -> str:
    from map_reduce_library_spark.querydefs._fragments import (
        bm25_scores_ctes,
    )

    return f"""
    WITH {bm25_scores_ctes(BM25_QUERY_TERMS)}
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
           round(sum(w), 9) AS bm25
    FROM w GROUP BY doc_id
    ORDER BY round(sum(w), 9) DESC, doc_id
    LIMIT {BM25_TOPK}
    """


@register("bm25_topk_docs", oracle=_bm25_oracle())
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-10 documents for a fixed bag-of-terms query
    — the lexical-search half of a retrieval stack (the ANN family is
    the semantic half). Term-filter-first + broadcast df + single
    corpus-length groupBy; scores rounded to 9 decimals before the
    top-k cut so the ranking is reproducible across engines."""
    from map_reduce_library_spark.operators.text import bm25_topk
    from map_reduce_library_spark.querydefs.dedup import shared_token_counts

    return bm25_topk(
        load_table(spark, sf_dir, "documents"),
        BM25_QUERY_TERMS,
        top_k=BM25_TOPK,
        counted=shared_token_counts(spark, sf_dir),
    )
