"""Incremental EMBEDDING dedup ingestion — driver-checked query for
``operators/similarity.py::incremental_emb_pairs`` (the semantic twin
of the text path's ``incremental_dedup_pairs``; streaming wiring in
``streaming/emb_ingest.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.querydefs._fragments import (
    oracle_banded_sigs_cte,
)
from map_reduce_library_spark.tables import load_table

INGEST_PCT = 10
COSINE_DUP_THRESHOLD = 0.4  # querydefs/dedup.py's constant
EMB_DIM = 64

# DuckDB twin of hash_bucket("vec_id") < INGEST_PCT (unsalted, the
# same convention as the text path's _NEW_DOC_PRED).
_NEW_VEC_PRED = (
    "(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 100)"
    f" < {INGEST_PCT}"
)


@register(
    "incremental_emb_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    sigd AS (
      {oracle_banded_sigs_cte('e')}
    ),
    nv AS (SELECT vec_id FROM embeddings WHERE {_NEW_VEC_PRED})
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS cosine
    FROM sigd a JOIN sigd b
      ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
            >= {COSINE_DUP_THRESHOLD}
      AND (a.vec_id IN (SELECT vec_id FROM nv)
           OR b.vec_id IN (SELECT vec_id FROM nv))
    """,
)
def incremental_emb_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ingest tick of incremental embedding dedup: near-dup pairs
    touching the incoming 10% vector batch, probed against the
    persisted signature index of the other 90%. Oracle computes the
    SAME set the opposite way — full-corpus band-OR LSH pairs
    filtered to new-vector membership — so the incremental plan's
    convergence claim (tick union == batch answer) is exactly what is
    differentially tested, mirroring ``incremental_dedup_pairs``."""
    from map_reduce_library_spark.operators.pipeline import hash_bucket
    from map_reduce_library_spark.operators.similarity import (
        banded_signatures,
        incremental_emb_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    b = hash_bucket("vec_id")
    incoming, existing = emb.where(b < INGEST_PCT), emb.where(
        b >= INGEST_PCT
    )
    index_sigs = banded_signatures(existing, EMB_DIM)
    return incremental_emb_pairs(
        index_sigs, incoming, COSINE_DUP_THRESHOLD, EMB_DIM
    )
