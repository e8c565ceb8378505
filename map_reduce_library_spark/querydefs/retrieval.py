"""Hybrid-retrieval queries: RRF fusion of the BM25 lexical ranker
and the embedding cosine ranker (documents and embeddings are joined
by id — doc_id == vec_id in the testdata star schema).

The BM25 CTE chain is textually the same scoring pipeline as the
``bm25_topk_docs`` oracle (same constants interpolated from
``operators.text``); the semantic CTE matches the ``cosine_topk``
oracle. The fusion differential therefore tests exactly the new
part: rank assignment, the full-outer rank join, and the fixed-order
1/(k+rank) sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.retrieval import (
    RRF_K,
    ranked,
    rrf_fuse,
)
from map_reduce_library_spark.operators.text import BM25_QUERY_TERMS
from map_reduce_library_spark.querydefs._fragments import bm25_scores_ctes
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

CAND_K = 50  # each ranker contributes its top-50
FUSED_K = 10
SEM_QUERY_ID = 0  # the query vector: embedding of doc 0

_RRF_ORACLE = f"""
    WITH {bm25_scores_ctes(BM25_QUERY_TERMS)},
    lexs AS (
      SELECT doc_id, round(sum(w), 9) AS bm25 FROM w GROUP BY doc_id
    ),
    lexk AS (
      SELECT doc_id, rnk FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM lexs
      ) WHERE rnk <= {CAND_K}
    ),
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      /* zero-norm guard mirroring operators/similarity._prep, same
         as the cosine_topk/ann_lsh_topk oracles (code-review r6) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    semk AS (
      SELECT doc_id, rnk FROM (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                          c.vec_id) AS rnk
        FROM e c CROSS JOIN (SELECT * FROM e WHERE vec_id = {SEM_QUERY_ID}) q
        WHERE c.vec_id != {SEM_QUERY_ID}
      ) WHERE rnk <= {CAND_K}
    )
    SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           l.rnk AS lex_rnk, s.rnk AS sem_rnk,
           round(coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.rnk), 0.0)
                 + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.rnk), 0.0),
                 9) AS rrf_score
    FROM lexk l FULL OUTER JOIN semk s ON l.doc_id = s.doc_id
    ORDER BY rrf_score DESC, coalesce(l.doc_id, s.doc_id)
    LIMIT {FUSED_K}
"""


@register("hybrid_rrf_topk", oracle=_RRF_ORACLE)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: top-{FUSED_K} documents by reciprocal-rank
    fusion of BM25 (fixed bag-of-terms query) and embedding cosine
    (query = doc 0's vector). Each ranker runs its own audited
    bounded-top-N plan; fusion is constant-size work."""
    from map_reduce_library_spark.operators.similarity import cosine_topk
    from map_reduce_library_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = ranked(
        bm25_topk(docs, BM25_QUERY_TERMS, top_k=CAND_K), "bm25"
    ).select("doc_id", "rnk")
    sem = cosine_topk(
        emb, F.col("vec_id") == SEM_QUERY_ID, CAND_K
    ).select(F.col("neighbor_id").alias("doc_id"), "rnk")
    return rrf_fuse({"lex": lex, "sem": sem}, top_k=FUSED_K)
