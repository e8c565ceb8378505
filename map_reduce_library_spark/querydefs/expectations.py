"""Data-quality expectations over the documents snapshot: the
promote-gate report. Two rules intentionally carry real violations in
the fixture corpus (length cap; the lang-id model's 4-language
whitelist vs the corpus's 5 languages), so the report proves
detection, not just green checkmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.quality import expectations_report
from map_reduce_library_spark.operators.text import STOPWORDS
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

MAX_CHARS = 400
_KNOWN_LANGS = tuple(STOPWORDS)  # the lang-id model's vocabulary
_LANG_LIST = ", ".join(f"'{l}'" for l in _KNOWN_LANGS)


@register(
    "data_quality_report",
    oracle=f"""
    SELECT 'doc_id_not_null' AS rule,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM documents
    UNION ALL
    SELECT 'text_non_empty', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                    THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN text IS NULL OR length(text) = 0
               THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'n_chars_consistent', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n_chars IS DISTINCT FROM length(text)
                    THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN n_chars IS DISTINCT FROM length(text)
               THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'lang_known', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN ({_LANG_LIST})
                    THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN lang IS NULL OR lang NOT IN ({_LANG_LIST})
               THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'n_chars_le_{MAX_CHARS}', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n_chars > {MAX_CHARS} THEN 1 ELSE 0 END)
             AS BIGINT),
           sum(CASE WHEN n_chars > {MAX_CHARS} THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'doc_id_unique', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT doc_id) AS BIGINT),
           count(*) - count(DISTINCT doc_id) = 0
    FROM documents
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations gate over documents: every row-level rule rides
    ONE aggregate scan (map-side partials, single-row result);
    uniqueness adds a distinct count. The whole report is constant
    output size at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return expectations_report(
        docs,
        {
            "doc_id_not_null": F.col("doc_id").isNull(),
            "text_non_empty": F.col("text").isNull()
            | (F.length("text") == 0),
            "n_chars_consistent": ~F.col("n_chars").eqNullSafe(
                F.length("text")
            ),
            "lang_known": F.col("lang").isNull()
            | ~F.col("lang").isin(*_KNOWN_LANGS),
            f"n_chars_le_{MAX_CHARS}": F.col("n_chars") > MAX_CHARS,
        },
        unique_keys=("doc_id",),
    )
