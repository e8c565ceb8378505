"""Text-analysis query corpus with DuckDB oracles generated from the
same stopword lists / regex / score formula as the Spark operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from map_reduce_library_spark.operators.text import (
    BPE_ISH_PATTERN,
    STOPWORDS,
    doc_fingerprints,
    lang_id,
    text_stats,
    token_counts,
)
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _sql_hit_ratio(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(toks, t -> t IN ({lst}))) / "
        f"CAST(greatest(len(toks), 1) AS DOUBLE)"
    )


@register(
    "text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text AS t, string_split(text, ' ') AS toks
               FROM documents),
    m AS (
      SELECT doc_id,
             CAST(length(t) AS BIGINT) AS n_chars_calc,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             {_sql_hit_ratio(STOPWORDS['en'])} AS stop_ratio
      FROM t
    )
    SELECT doc_id, n_tokens, n_distinct,
           (n_chars_calc - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
           n_distinct / CAST(n_tokens AS DOUBLE) AS ttr,
           stop_ratio,
           round(least(n_tokens / 50.0, 1.0) * 0.4
                 + least((n_distinct / CAST(n_tokens AS DOUBLE)) * 2, 1.0) * 0.4
                 + least(stop_ratio * 5, 1.0) * 0.2, 6) AS quality_score
    FROM m
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality stats + composite score."""
    return text_stats(load_table(spark, sf_dir, "documents"))


_LANG_SCORES_SQL = ",\n             ".join(
    f"{_sql_hit_ratio(ws)} AS score_{lang}" for lang, ws in STOPWORDS.items()
)
_LANG_STRUCTS = ", ".join(
    f"{{'s': score_{lang}, 'l': '{lang}'}}" for lang in STOPWORDS
)
_LANG_GREATEST = ", ".join(f"score_{lang}" for lang in STOPWORDS)


@register(
    "lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             {_LANG_SCORES_SQL}
      FROM t
    )
    SELECT doc_id, {_LANG_GREATEST},
           CASE WHEN greatest({_LANG_GREATEST}) < 0.02 THEN 'und'
                ELSE list_max([{_LANG_STRUCTS}]).l END AS pred_lang
    FROM s
    """,
)
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
    return token_counts(load_table(spark, sf_dir, "documents"))


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
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.count()  # scalar; drives the idf constant only
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .withColumn("score", F.col("tf") * F.log(F.lit(n_docs) / F.col("df")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_term"),
            F.round("score", 9).alias("tfidf"),
        )
    )
