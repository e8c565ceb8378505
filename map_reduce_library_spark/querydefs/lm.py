"""Language-model perplexity scoring — the CCNet/Gopher-style quality
signal: score every document by its average negative log-likelihood
under a bigram model fit on the corpus itself, then surface the most
surprising documents (the boilerplate/junk/wrong-language tail that
perplexity filtering removes before training).

Model: add-one-smoothed bigram conditionals
``p(b | a) = (c_ab + 1) / (c_a + V)`` with exact corpus counts
(c_ab = bigram occurrences, c_a = unigram occurrences, V = vocabulary
size). Per-occurrence NLL terms are ln of a rational of exact
integers, rounded to 9 decimals (the PMI convention — both engines see
the same rational), then summed as DECIMAL so the per-document total
is order-independent: float sums would differ between engines at the
last ulp under different reduction orders, decimals cannot.

Scale shape: bigram/unigram count relations are corpus-keyed shuffle
aggregates (the word-count pattern at order 2); the per-occurrence
joins shuffle on token/bigram keys only; V rides in as a one-row
broadcast; the final top-k is TakeOrderedAndProject. Everything is
linear in corpus size.

Extension operator (SURVEY.md §2D text analysis) — the map/group/
reduce core's word-count workload (FileWordCounter.cpp C1-C6)
composed into an actual language model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.lm import bigram_nll_scores
from map_reduce_library_spark.queries import register

PPL_TOP_DOCS = 50


@register(
    "bigram_perplexity_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    occ AS (
      SELECT doc_id,
             unnest(toks[1:len(toks) - 1]) AS tok_a,
             unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t
    ),
    alltok AS (SELECT unnest(toks) AS tok_a FROM t),
    uni AS (SELECT tok_a, count(*) AS c_a FROM alltok GROUP BY tok_a),
    big AS (SELECT bigram, count(*) AS c_ab FROM occ GROUP BY bigram),
    v AS (SELECT count(*) AS vsize FROM uni),
    terms AS (
      SELECT occ.doc_id,
             round(ln((u.c_a + v.vsize)
                      / CAST(b.c_ab + 1 AS DOUBLE)), 9) AS nll
      FROM occ
      JOIN uni u USING (tok_a)
      JOIN big b USING (bigram)
      CROSS JOIN v
    ),
    ag AS (
      SELECT doc_id, count(*) AS n_bigrams,
             sum(CAST(nll AS DECIMAL(20,9))) AS tot
      FROM terms GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           round(CAST(tot AS DOUBLE) / n_bigrams, 6) AS avg_nll
    FROM ag
    ORDER BY avg_nll DESC, doc_id
    LIMIT {PPL_TOP_DOCS}
    """,
)
def bigram_perplexity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {PPL_TOP_DOCS} highest-perplexity documents under the
    corpus's own add-one bigram LM (``operators/lm.py`` holds the
    scoring; see module docstring for the model and the decimal-sum
    determinism discipline)."""
    from map_reduce_library_spark.querydefs.text import shared_doc_tokens

    return (
        bigram_nll_scores(token_arrays=shared_doc_tokens(spark, sf_dir))
        .orderBy(F.col("avg_nll").desc(), "doc_id")
        .limit(PPL_TOP_DOCS)
    )
