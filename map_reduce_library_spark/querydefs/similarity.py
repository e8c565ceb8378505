"""Similarity-search query corpus with generated DuckDB oracles
(identical hyperplanes inlined into both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.querydefs._fragments import (
    EMB_DIM,
    oracle_banded_sigs_cte as _oracle_banded_sigs_cte,
    oracle_sig_sql as _oracle_sig_sql,
)
from map_reduce_library_spark.tables import load_table

TOPK = 5
N_QUERIES = 20  # vec_id < 20 are the query vectors

_SHARED_BANDED_SIGS: dict[tuple[str, str], DataFrame] = {}


def shared_banded_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, nrm, tbl, sig) band-OR LSH signature relation,
    materialized once per (session, sf_dir) — every multi-table LSH
    consumer (ann top-k, embedding dedup, both recall gates) and both
    sides of each self-join read the same checkpoint instead of
    recomputing the tables×planes plane dots. At 100 TB this is the
    LSH index: one parquet write, many readers (same pattern as
    ``querydefs.dedup.shared_wide_fingerprints``)."""
    from map_reduce_library_spark.operators.similarity import (
        banded_signatures,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SHARED_BANDED_SIGS.get(key)
    if df is None:
        df = banded_signatures(
            load_table(spark, sf_dir, "embeddings"), EMB_DIM
        ).localCheckpoint(eager=True)
        _SHARED_BANDED_SIGS[key] = df
    return df


@register(
    "cosine_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, cosine FROM ranked WHERE rnk <= {TOPK}
    """,
)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for the first N_QUERIES=20
    vectors as queries — the ANN correctness baseline."""
    return cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    sigd AS (
      {_oracle_banded_sigs_cte('e')}
    ),
    scored AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM sigd q JOIN sigd c ON q.tbl = c.tbl AND q.sig = c.sig
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, cosine FROM ranked WHERE rnk <= {TOPK}
    """,
)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-OR multi-table hyperplane-LSH ANN top-k (ANN_TABLES
    tables × ANN_BAND_PLANES planes → union of per-table bucket
    collisions); exact cosine within candidates."""
    return ann_lsh_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        dim=EMB_DIM,
        sigs=shared_banded_sigs(spark, sf_dir),
    )


def _recall_oracle() -> str:
    from map_reduce_library_spark.queries import ORACLES

    return f"""
    WITH exact_k AS ({ORACLES["cosine_topk"]}),
    ann_k AS ({ORACLES["ann_lsh_topk"]}),
    hits AS (
      SELECT e.query_id,
             count(a.neighbor_id) AS n_hits
      FROM exact_k e
      LEFT JOIN ann_k a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id
    )
    SELECT query_id, n_hits,
           n_hits / CAST({TOPK} AS DOUBLE) AS recall_at_k
    FROM hits
    """


@register("ann_recall_at_k", oracle=_recall_oracle())
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: recall@k of the hyperplane-LSH
    ANN against the exact brute-force top-k, per query vector — the
    metric every ANN deployment tracks before trading exactness for
    throughput. Composes the two existing operators; the oracle
    composes their oracles identically."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, F.col("vec_id") < N_QUERIES, TOPK).select(
        "query_id", "neighbor_id"
    )
    ann = ann_lsh_topk(
        emb,
        F.col("vec_id") < N_QUERIES,
        TOPK,
        dim=EMB_DIM,
        sigs=shared_banded_sigs(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("ann_neighbor_id"))
    return (
        exact.join(
            ann,
            (exact.query_id == ann.query_id)
            & (exact.neighbor_id == ann.ann_neighbor_id),
            "left",
        )
        .groupBy(exact.query_id.alias("query_id"))
        .agg(F.count("ann_neighbor_id").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits") / F.lit(float(TOPK))).alias("recall_at_k"),
        )
    )


N_CENTROIDS = 16

@register(
    "ivf_ann_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cell, v AS vc, nrm AS nc FROM e
              WHERE vec_id < {N_CENTROIDS}),
    assigned AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT e.vec_id, e.v, e.nrm, cents.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cents.vc) / (e.nrm * cents.nc)
                          DESC, cents.cell) AS rn
        FROM e CROSS JOIN cents
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM assigned q JOIN assigned c ON q.cell = c.cell
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, cosine FROM ranked WHERE rnk <= {TOPK}
    """,
)
def ivf_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (single-probe, deterministic seed centroids):
    the second scale path next to hyperplane LSH."""
    from map_reduce_library_spark.operators.similarity import ivf_ann_topk

    return ivf_ann_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        n_centroids=N_CENTROIDS,
    )


N_PROBE = 2


def _ivf_multiprobe_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cell, v AS vc, nrm AS nc FROM e
              WHERE vec_id < {N_CENTROIDS}),
    probes AS (
      SELECT vec_id, v, nrm, cell, rn FROM (
        SELECT e.vec_id, e.v, e.nrm, cents.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cents.vc) / (e.nrm * cents.nc)
                          DESC, cents.cell) AS rn
        FROM e CROSS JOIN cents
      ) WHERE rn <= {N_PROBE}
    ),
    homed AS (SELECT vec_id, v, nrm, cell FROM probes WHERE rn = 1),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM probes q JOIN homed c ON q.cell = c.cell
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, cosine FROM ranked WHERE rnk <= {TOPK}
    """


@register("ivf_ann_multiprobe_topk", oracle=_ivf_multiprobe_oracle())
def ivf_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: queries probe their N_PROBE nearest cells
    (corpus stays home-cell-indexed), the standard recall knob for
    inverted-file indexes — the IVF counterpart of LSH band-OR."""
    from map_reduce_library_spark.operators.similarity import ivf_ann_topk

    return ivf_ann_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
    )


def _ivf_recall_oracle() -> str:
    from map_reduce_library_spark.queries import ORACLES

    return f"""
    WITH exact_k AS ({ORACLES["cosine_topk"]}),
    ivf_k AS ({ORACLES["ivf_ann_multiprobe_topk"]}),
    hits AS (
      SELECT e.query_id, count(a.neighbor_id) AS n_hits
      FROM exact_k e
      LEFT JOIN ivf_k a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id
    )
    SELECT query_id, n_hits,
           n_hits / CAST({TOPK} AS DOUBLE) AS recall_at_k
    FROM hits
    """


@register("ivf_recall_at_k", oracle=_ivf_recall_oracle())
def ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of multi-probe IVF against the exact brute-force
    top-k — the measured-recall gate for the IVF path, mirroring
    ``ann_recall_at_k`` for LSH."""
    from map_reduce_library_spark.operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, F.col("vec_id") < N_QUERIES, TOPK).select(
        "query_id", "neighbor_id"
    )
    ivf = ivf_ann_topk(
        emb,
        F.col("vec_id") < N_QUERIES,
        TOPK,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
    ).select("query_id", F.col("neighbor_id").alias("ivf_neighbor_id"))
    return (
        exact.join(
            ivf,
            (exact.query_id == ivf.query_id)
            & (exact.neighbor_id == ivf.ivf_neighbor_id),
            "left",
        )
        .groupBy(exact.query_id.alias("query_id"))
        .agg(F.count("ivf_neighbor_id").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits") / F.lit(float(TOPK))).alias("recall_at_k"),
        )
    )
