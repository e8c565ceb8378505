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

    from map_reduce_library_spark.querydefs._shared import (
        shared_checkpoint,
    )

    return shared_checkpoint(
        _SHARED_BANDED_SIGS,
        spark,
        sf_dir,
        lambda: banded_signatures(
            load_table(spark, sf_dir, "embeddings"), EMB_DIM
        ),
    )


_SHARED_IVF_ASSIGNED: dict = {}


def shared_ivf_assigned(
    spark: SparkSession, sf_dir: str, n_probe: int, fitted: bool = False
) -> DataFrame:
    """The (vec_id, v, nrm, cell, probe_rank) IVF assignment relation,
    materialized once per (session, sf_dir, probe-width, codebook):
    ivf_ann_topk references it on BOTH join sides, so without the
    checkpoint the O(n x centroids) crossJoin + window ranking ran
    twice per query — and the recall gates re-ran it again
    (code-review r6). At 100 TB the assignment IS the inverted-file
    index: built once, read by every query."""
    from map_reduce_library_spark.operators.similarity import (
        ivf_assign_cells,
    )
    from map_reduce_library_spark.querydefs._shared import (
        shared_checkpoint,
    )

    cache = _SHARED_IVF_ASSIGNED.setdefault((n_probe, fitted), {})
    return shared_checkpoint(
        cache,
        spark,
        sf_dir,
        lambda: ivf_assign_cells(
            load_table(spark, sf_dir, "embeddings"),
            N_CENTROIDS,
            n_probe=n_probe,
            centroids=(
                shared_kmeans_centroids(spark, sf_dir) if fitted else None
            ),
        ),
    )


def _recall_oracle_for(ann_key: str) -> str:
    """ONE recall@k oracle template (was copy-pasted per ANN variant;
    code-review r6): exact top-k left-joined against the variant's
    top-k, hit count normalized by the constant TOPK (immune to an
    empty approx side, unlike dividing by a data-dependent count)."""
    from map_reduce_library_spark.queries import ORACLES

    return f"""
    WITH exact_k AS ({ORACLES["cosine_topk"]}),
    ann_k AS ({ORACLES[ann_key]}),
    hits AS (
      SELECT e.query_id, count(a.neighbor_id) AS n_hits
      FROM exact_k e
      LEFT JOIN ann_k a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id
    )
    SELECT query_id, n_hits,
           n_hits / CAST({TOPK} AS DOUBLE) AS recall_at_k
    FROM hits
    """


def _recall_df(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """ONE Spark recall@k body shared by the three gates."""
    a = approx.select(
        "query_id", F.col("neighbor_id").alias("a_neighbor_id")
    )
    return (
        exact.join(
            a,
            (exact.query_id == a.query_id)
            & (exact.neighbor_id == a.a_neighbor_id),
            "left",
        )
        .groupBy(exact.query_id.alias("query_id"))
        .agg(F.count("a_neighbor_id").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits") / F.lit(float(TOPK))).alias("recall_at_k"),
        )
    )



@register(
    "cosine_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      /* zero-norm guard mirroring operators/similarity._prep (Spark
         drops zero vectors; an unguarded oracle would rank NULL
         cosines into trailing top-k slots) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
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
      /* zero-norm guard mirroring operators/similarity._prep (Spark
         drops zero vectors; an unguarded oracle would rank NULL
         cosines into trailing top-k slots) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
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


@register("ann_recall_at_k", oracle=_recall_oracle_for("ann_lsh_topk"))
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: recall@k of the hyperplane-LSH
    ANN against the exact brute-force top-k, per query vector — the
    metric every ANN deployment tracks before trading exactness for
    throughput. Composes the two existing operators; the oracle
    composes their oracles identically."""
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
    )
    return _recall_df(exact, ann)


N_CENTROIDS = 16

@register(
    "ivf_ann_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      /* zero-norm guard mirroring operators/similarity._prep (Spark
         drops zero vectors; an unguarded oracle would rank NULL
         cosines into trailing top-k slots) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
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
        assigned=shared_ivf_assigned(spark, sf_dir, n_probe=1),
    )


N_PROBE = 2


def _ivf_multiprobe_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      /* zero-norm guard mirroring operators/similarity._prep (Spark
         drops zero vectors; an unguarded oracle would rank NULL
         cosines into trailing top-k slots) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
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
        assigned=shared_ivf_assigned(spark, sf_dir, n_probe=N_PROBE),
    )


KMEANS_ITERS = 2
# Probe width for the FITTED codebook, measured at sf0.01: Lloyd
# balances the cells (max cell 42 -> 38 of ~1000 vectors), which is
# the behavior you want at 100 TB (no straggler cells in the bucket
# join) but it removes the seed codebook's lucky-giant-cell recall —
# at n_probe=2 fitted recall@5 is 0.74 vs seed 0.81. Probe width is
# IVF's standard recall knob: fitted @ n_probe=4 measures 0.84
# (2489 candidates) vs seed @ n_probe=2 0.81 (1221), so the fitted
# path meets the seed number with balanced cells. On a clustered real
# corpus the fit wins at equal probes; this synthetic table is
# near-uniform, so the extra probes buy the parity instead.
KMEANS_N_PROBE = 4

_SHARED_KMEANS_CENTROIDS: dict[tuple[str, str], DataFrame] = {}


def shared_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted IVF codebook, computed once per (session, sf_dir) —
    the k-means fit is the expensive index-build step, and both the
    fitted-IVF query and its recall gate read the same checkpoint
    (one-write-many-reads, like ``shared_banded_sigs``)."""
    from map_reduce_library_spark.operators.similarity import (
        kmeans_centroids,
    )

    from map_reduce_library_spark.querydefs._shared import (
        shared_checkpoint,
    )

    return shared_checkpoint(
        _SHARED_KMEANS_CENTROIDS,
        spark,
        sf_dir,
        lambda: kmeans_centroids(
            load_table(spark, sf_dir, "embeddings"),
            N_CENTROIDS,
            iters=KMEANS_ITERS,
        ),
    )


def _kmeans_cents_ctes(iters: int = KMEANS_ITERS) -> str:
    """Unrolled Lloyd iterations as chained CTEs — the DuckDB twin of
    ``operators.similarity.kmeans_centroids``. Exact cross-engine
    parity holds because (a) dot products are sequential folds over
    identical arrays in both engines, (b) each iteration's per-cell
    mean is rounded to 6 decimals before it feeds the next assignment,
    absorbing distributed-float-sum wobble."""
    parts = [
        f"c0 AS (SELECT vec_id AS cell, v AS vc, nrm AS nc FROM e "
        f"WHERE vec_id < {N_CENTROIDS})"
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts.append(f"""
    a{it} AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.vc) / (e.nrm * c.nc)
                          DESC, c.cell) AS rn
        FROM e CROSS JOIN {prev} c) WHERE rn = 1
    ),
    m{it} AS (
      SELECT cell, i, round(avg(v[i]), 6) AS m
      FROM a{it} CROSS JOIN generate_series(1, {EMB_DIM}) g(i)
      GROUP BY cell, i
    ),
    c{it} AS (
      SELECT cell, vc, nc FROM (
        SELECT cell, vc, sqrt(list_dot_product(vc, vc)) AS nc FROM (
          SELECT cell, list(m ORDER BY i) AS vc FROM m{it} GROUP BY cell))
      /* zero-norm centroid guard, mirroring kmeans_centroids */
      WHERE nc > 0
    )""")
    return ",".join(parts)


def _ivf_kmeans_oracle() -> str:
    cN = f"c{KMEANS_ITERS}"
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      /* zero-norm guard mirroring operators/similarity._prep (Spark
         drops zero vectors; an unguarded oracle would rank NULL
         cosines into trailing top-k slots) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    {_kmeans_cents_ctes()},
    probes AS (
      SELECT vec_id, v, nrm, cell, rn FROM (
        SELECT e.vec_id, e.v, e.nrm, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.vc) / (e.nrm * c.nc)
                          DESC, c.cell) AS rn
        FROM e CROSS JOIN {cN} c) WHERE rn <= {KMEANS_N_PROBE}
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


@register("ivf_kmeans_topk", oracle=_ivf_kmeans_oracle())
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN over a FITTED codebook: Lloyd's k-means
    (declarative, deterministic — see ``kmeans_centroids``) replaces
    the first-N-by-id seed centroids, closing the round-4 verdict's
    'plumbing-only' gap in the ANN stack. The oracle unrolls the same
    Lloyd iterations as chained CTEs, so the fit itself — not just the
    assignment — is hash-verified against DuckDB."""
    from map_reduce_library_spark.operators.similarity import ivf_ann_topk

    return ivf_ann_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        n_centroids=N_CENTROIDS,
        n_probe=KMEANS_N_PROBE,
        centroids=shared_kmeans_centroids(spark, sf_dir),
        assigned=shared_ivf_assigned(
            spark, sf_dir, n_probe=KMEANS_N_PROBE, fitted=True
        ),
    )


@register(
    "ivf_kmeans_recall_at_k", oracle=_recall_oracle_for("ivf_kmeans_topk")
)
def ivf_kmeans_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the fitted-codebook IVF against exact brute-force
    top-k — MEASURED, so the k-means fit has to earn its keep against
    the seed-centroid ``ivf_recall_at_k`` number (the fit tightens
    cells around the data's actual clusters, so same-cell probability
    for true neighbors should rise at equal probe cost)."""
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
        n_probe=KMEANS_N_PROBE,
        centroids=shared_kmeans_centroids(spark, sf_dir),
        assigned=shared_ivf_assigned(
            spark, sf_dir, n_probe=KMEANS_N_PROBE, fitted=True
        ),
    )
    return _recall_df(exact, ivf)


@register(
    "ivf_recall_at_k", oracle=_recall_oracle_for("ivf_ann_multiprobe_topk")
)
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
        assigned=shared_ivf_assigned(spark, sf_dir, n_probe=N_PROBE),
    )
    return _recall_df(exact, ivf)


@register(
    "filtered_ann_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      /* zero-norm guard mirroring operators/similarity._prep (Spark
         drops zero vectors; an unguarded oracle would rank NULL
         cosines into trailing top-k slots) */
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    scored AS (
      SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      FROM e q JOIN e c
        ON q.label = c.label
       AND q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, label, neighbor_id, rnk, cosine
    FROM ranked WHERE rnk <= {TOPK}
    """,
)
def filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: top-5 (TOPK) same-LABEL neighbors for
    the first 20 (N_QUERIES) query vectors — the metadata-filter + ANN
    production pattern. The filter key converts the brute-force cross
    join into a broadcast hash equi-join (no BNLJ): distance math runs
    only inside each query's label partition."""
    from map_reduce_library_spark.operators.similarity import (
        filtered_cosine_topk,
    )

    return filtered_cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        "label",
    )


# ---- IVF-PQ (VERDICT r7 item 6) -------------------------------------------
# Coarse seed-IVF cells (the ivf_ann_multiprobe geometry, n_probe=2)
# + product-quantized fine scoring: the index the scoring join reads
# is (neighbor_id, cell) + (neighbor_id, sub, code) — ids and small
# ints, never the float vectors, which is what makes ANN fit executor
# memory at 100-TB-embeddings scale. The oracle re-derives the entire
# grouped per-subspace Lloyd fit, the code assignment, the ADC lookup
# table, and the rounded-sum scoring — full-pipeline differential.

from map_reduce_library_spark.operators.similarity import (  # noqa: E402
    PQ_CODES,
    PQ_ITERS,
    PQ_M,
    ivf_pq_topk,
    pq_codebooks,
    pq_encode,
)

PQ_SUB_DIM = EMB_DIM // PQ_M

_SHARED_PQ_CODEBOOKS: dict = {}
_SHARED_PQ_CODES: dict = {}


def shared_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_library_spark.querydefs._shared import shared_checkpoint

    return shared_checkpoint(
        _SHARED_PQ_CODEBOOKS,
        spark,
        sf_dir,
        lambda: pq_codebooks(
            load_table(spark, sf_dir, "embeddings"), EMB_DIM
        ),
    )


def shared_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_library_spark.querydefs._shared import shared_checkpoint

    return shared_checkpoint(
        _SHARED_PQ_CODES,
        spark,
        sf_dir,
        lambda: pq_encode(
            load_table(spark, sf_dir, "embeddings"),
            shared_pq_codebooks(spark, sf_dir),
            EMB_DIM,
        ),
    )


def _pq_lloyd_ctes(iters: int = PQ_ITERS, train_max: int | None = None) -> str:
    """Grouped per-subspace Lloyd as chained CTEs — the DuckDB twin of
    ``operators.similarity.pq_codebooks``. The ARGMIN distance is the
    un-rounded fold identity (|a|^2+|b|^2-2ab, the same expression
    text both engines evaluate as left folds); per-iteration means
    round to 6 decimals exactly like the Spark side. ``train_max``
    restricts the Lloyd iterations to vec_id < train_max (the
    ``build_ivf_pq_index(train=...)`` twin — codebooks fit on the
    initial corpus only, later vectors encoded frozen); the seed
    codebook (vec_id < PQ_CODES) is inside any sane train set."""
    train = f"WHERE sv.vec_id < {train_max}" if train_max is not None else ""
    parts = [
        f"""sv AS (
      SELECT e.vec_id, s.sub,
             e.v[s.sub * {PQ_SUB_DIM} + 1 : s.sub * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
      FROM e CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS sub) s
    ),
    pq0 AS (SELECT sub, vec_id AS cell, sv AS vc FROM sv
            WHERE vec_id < {PQ_CODES})"""
    ]
    for it in range(1, iters + 1):
        prev = f"pq{it - 1}"
        parts.append(f"""
    pa{it} AS (
      SELECT vec_id, sub, sv, cell FROM (
        SELECT sv.vec_id, sv.sub, sv.sv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY (list_dot_product(sv.sv, sv.sv)
                           + list_dot_product(c.vc, c.vc))
                          - 2 * list_dot_product(sv.sv, c.vc) ASC,
                          c.cell) AS rn
        FROM sv JOIN {prev} c ON sv.sub = c.sub {train}) WHERE rn = 1
    ),
    pm{it} AS (
      SELECT sub, cell, i, round(avg(sv[i]), 6) AS mval
      FROM pa{it} CROSS JOIN generate_series(1, {PQ_SUB_DIM}) g(i)
      GROUP BY sub, cell, i
    ),
    pq{it} AS (
      SELECT sub, cell, list(mval ORDER BY i) AS vc
      FROM pm{it} GROUP BY sub, cell
    )""")
    return ",".join(parts)


def _ivf_pq_oracle(
    limit: int = TOPK,
    train_max: int | None = None,
    corpus_pred: str | None = None,
    filter_col: str | None = None,
    full_probe: bool = False,
) -> str:
    """``corpus_pred`` restricts INDEX MEMBERSHIP (the homed corpus
    side) without touching the fitted artifacts — the oracle twin of
    ``delete_from_ivf_pq_index``: codebooks/centroids stay trained on
    the full corpus, deleted vectors just stop being candidates.
    ``filter_col`` adds metadata-filtered search: the column threads
    through the homed relation and joins into the candidate equality
    — the twin of ``ivf_pq_search(filter_cols=[...])``.

    ``full_probe=True`` drops the coarse-quantizer CTEs entirely and
    scores every (query, member) pair — brute ADC. With every cell
    probed, IVF pruning is a no-op whatever the centroid geometry, so
    this oracle is CENTROID-INDEPENDENT: exactly what a query over a
    REBALANCED index needs, whose post-split sub-centroids (Lloyd on
    PQ reconstructions) would otherwise demand their own deep CTE
    chain. Hash-green against it proves a layout op changed pruning
    geometry only — every code row intact, none duplicated (a
    double-counted row inflates its ADC sum by √2)."""
    cb = f"pq{PQ_ITERS}"
    member = f" AND ({corpus_pred})" if corpus_pred else ""
    fsel = f", {filter_col}" if filter_col else ""
    fsel_e = f", e.{filter_col}" if filter_col else ""
    fmatch = (
        f" AND p.{filter_col} = h.{filter_col}" if filter_col else ""
    )
    if full_probe:
        assert filter_col is None, "full_probe oracle has no filter path"
        return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    {_pq_lloyd_ctes(train_max=train_max)},
    codesq AS (
      SELECT vec_id, sub, cell AS code FROM (
        SELECT sv.vec_id, sv.sub, c.cell,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY (list_dot_product(sv.sv, sv.sv)
                           + list_dot_product(c.vc, c.vc))
                          - 2 * list_dot_product(sv.sv, c.vc) ASC,
                          c.cell) AS rn
        FROM sv JOIN {cb} c ON sv.sub = c.sub) WHERE rn = 1
    ),
    cn AS (SELECT sub, cell AS code,
                  list_dot_product(vc, vc) AS cn2 FROM {cb}),
    homed AS (SELECT vec_id AS neighbor_id FROM e WHERE TRUE{member}),
    qs AS (SELECT vec_id AS query_id, sub, sv FROM sv
           WHERE vec_id < {N_QUERIES}),
    lut AS (
      SELECT q.query_id, c.sub, c.cell AS code,
             list_dot_product(q.sv, c.vc) AS qd
      FROM qs q JOIN {cb} c ON q.sub = c.sub
    ),
    cand AS (
      SELECT q.vec_id AS query_id, q.nrm AS nq, h.neighbor_id
      FROM e q CROSS JOIN homed h
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id != h.neighbor_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, c.nq,
             round(sum(l.qd), 6) AS adot,
             round(sum(n.cn2), 6) AS rn2
      FROM cand c
      JOIN codesq k ON c.neighbor_id = k.vec_id
      JOIN lut l ON l.query_id = c.query_id AND l.sub = k.sub
                AND l.code = k.code
      JOIN cn n ON n.sub = k.sub AND n.code = k.code
      GROUP BY c.query_id, c.neighbor_id, c.nq
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             adot / (nq * sqrt(rn2)) AS cosine_pq,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adot / (nq * sqrt(rn2)) DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, cosine_pq
    FROM ranked WHERE rnk <= {limit}
    """
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm{fsel}
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    {_pq_lloyd_ctes(train_max=train_max)},
    codesq AS (
      SELECT vec_id, sub, cell AS code FROM (
        SELECT sv.vec_id, sv.sub, c.cell,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY (list_dot_product(sv.sv, sv.sv)
                           + list_dot_product(c.vc, c.vc))
                          - 2 * list_dot_product(sv.sv, c.vc) ASC,
                          c.cell) AS rn
        FROM sv JOIN {cb} c ON sv.sub = c.sub) WHERE rn = 1
    ),
    cn AS (SELECT sub, cell AS code,
                  list_dot_product(vc, vc) AS cn2 FROM {cb}),
    cents AS (SELECT vec_id AS cell, v AS vc2, nrm AS nc FROM e
              WHERE vec_id < {N_CENTROIDS}),
    probes AS (
      SELECT vec_id, v, nrm, cell, rn{fsel} FROM (
        SELECT e.vec_id, e.v, e.nrm, cents.cell{fsel_e},
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cents.vc2) / (e.nrm * cents.nc)
                          DESC, cents.cell) AS rn
        FROM e CROSS JOIN cents) WHERE rn <= {N_PROBE}
    ),
    homed AS (SELECT vec_id AS neighbor_id, cell{fsel} FROM probes
              WHERE rn = 1{member}),
    qs AS (SELECT vec_id AS query_id, sub, sv FROM sv
           WHERE vec_id < {N_QUERIES}),
    lut AS (
      SELECT q.query_id, c.sub, c.cell AS code,
             list_dot_product(q.sv, c.vc) AS qd
      FROM qs q JOIN {cb} c ON q.sub = c.sub
    ),
    cand AS (
      SELECT p.vec_id AS query_id, p.nrm AS nq, h.neighbor_id
      FROM probes p JOIN homed h ON p.cell = h.cell{fmatch}
      WHERE p.vec_id < {N_QUERIES} AND p.vec_id != h.neighbor_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, c.nq,
             round(sum(l.qd), 6) AS adot,
             round(sum(n.cn2), 6) AS rn2
      FROM cand c
      JOIN codesq k ON c.neighbor_id = k.vec_id
      JOIN lut l ON l.query_id = c.query_id AND l.sub = k.sub
                AND l.code = k.code
      JOIN cn n ON n.sub = k.sub AND n.code = k.code
      GROUP BY c.query_id, c.neighbor_id, c.nq
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             adot / (nq * sqrt(rn2)) AS cosine_pq,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adot / (nq * sqrt(rn2)) DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, cosine_pq
    FROM ranked WHERE rnk <= {limit}
    """


@register("ivf_pq_topk", oracle=_ivf_pq_oracle())
def ivf_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-k: coarse multi-probe IVF pruning + ADC scoring
    over {PQ_M}x{PQ_CODES} product-quantized codes — the
    compressed-index ANN path for corpora whose float vectors cannot
    be memory-resident (VERDICT r7 item 6)."""
    return ivf_pq_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        dim=EMB_DIM,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        assigned=shared_ivf_assigned(spark, sf_dir, n_probe=N_PROBE),
        codebooks=shared_pq_codebooks(spark, sf_dir),
        encoded=shared_pq_codes(spark, sf_dir),
    )


@register("ivf_pq_recall_at_k", oracle=_recall_oracle_for("ivf_pq_topk"))
def ivf_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOPK} of IVF-PQ against exact brute-force cosine — the
    quantization-distortion + cell-miss gate. Measured at sf0.01:
    see tests/test_similarity2.py's floor assertion."""
    exact = cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
    )
    approx = ivf_pq_topk_q(spark, sf_dir)
    return _recall_df(exact, approx)


from map_reduce_library_spark.operators.similarity import (  # noqa: E402
    PQ_RERANK_SHORTLIST,
    ivf_pq_rerank_topk,
)


def _ivf_pq_rerank_oracle() -> str:
    return f"""
    WITH short AS ({_ivf_pq_oracle(PQ_RERANK_SHORTLIST)}),
    e3 AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    rescored AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cosine
      FROM short s
      JOIN e3 q ON q.vec_id = s.query_id
      JOIN e3 n ON n.vec_id = s.neighbor_id
    ),
    rranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM rescored
    )
    SELECT query_id, neighbor_id, rnk, cosine
    FROM rranked WHERE rnk <= {TOPK}
    """


@register("ivf_pq_rerank_topk", oracle=_ivf_pq_rerank_oracle())
def ivf_pq_rerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC + exact re-rank: ADC shortlist of {PQ_RERANK_SHORTLIST}
    per query from the compressed index, float vectors fetched only
    for the shortlist, exact cosine re-rank to top-{TOPK} — the
    production compressed-ANN query shape."""
    return ivf_pq_rerank_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
        dim=EMB_DIM,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        assigned=shared_ivf_assigned(spark, sf_dir, n_probe=N_PROBE),
        codebooks=shared_pq_codebooks(spark, sf_dir),
        encoded=shared_pq_codes(spark, sf_dir),
    )


@register(
    "ivf_pq_rerank_recall_at_k",
    oracle=_recall_oracle_for("ivf_pq_rerank_topk"),
)
def ivf_pq_rerank_recall_at_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """recall@{TOPK} of re-ranked IVF-PQ vs exact cosine. Measured at
    sf0.01: mean 0.81 — identical to the UNCOMPRESSED multiprobe IVF
    at the same probe width, i.e. the quantization is end-metric
    lossless once re-ranked; residual loss is coarse-cell miss
    (n_probe-tunable). Floor pinned in tests/test_similarity.py."""
    exact = cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < N_QUERIES,
        TOPK,
    )
    return _recall_df(exact, ivf_pq_rerank_topk_q(spark, sf_dir))


# ---- persisted IVF-PQ index lifecycle (VERDICT r8 item 1) -------------------

# Codebook train cutoff for the incremental query: the first half of
# the smallest embeddings table (500 rows at sf0.001/sf0.01) — the
# "initial corpus" the index is fit on before later vectors arrive.
PQ_TRAIN_MAX = 250
# Rebalance bound for the "rebalanced" index variant: the sf0.01 seed
# cells run 20-42 rows (mean ~31), so target 15 (split threshold 2×15
# = 30) splits the heavy half of the cells — a real re-cut, not a
# no-op — while sf0.1 (mean ~125) splits everything, the
# uniform-growth shape.
PQ_REBALANCE_TARGET = 15

# Deletion set for the remove_ids query: a deterministic ~14% slice
# of the corpus that never touches the query vectors (vec_id <
# N_QUERIES) nor the codebook seeds. SQL twin must match exactly.
# Built lazily: Spark-classic Column construction needs an active
# SparkContext, and this module imports before any session exists
# (registry import order).
def _pq_delete_pred():
    return (F.col("vec_id") >= N_QUERIES) & (
        F.pmod(F.col("vec_id"), F.lit(7)) == 3
    )


PQ_DELETE_PRED_SQL = f"NOT (vec_id >= {N_QUERIES} AND vec_id % 7 = 3)"

# (applicationId, sf_dir, variant) -> on-disk index path. The index
# artifact is the definition of "persisted": built and WRITTEN once
# per session, then every query (and every bench pass) serves from
# the stored parquet relations — the write-once/read-many production
# shape, same policy as the checkpointed shared intermediates
# (BASELINE.md: consumer-query times measure the post-materialization
# pipeline; the build cost shows in pass 1 / wall_2pass). Scratch
# dirs are removed at interpreter exit, not per call — removing a
# "persisted" artifact after each read would be a contradiction.
_PERSISTED_IVFPQ: dict = {}

# (applicationId, path) -> IvfPqIndex of analyzed relations. The serve
# queries below read a FROZEN per-session artifact (built/mutated to
# completion inside _persisted_index_path before any read), so the
# four per-call spark.read.parquet schema inferences — measured
# ~0.36 s of driver time per serve query — are pure repetition.
# Plan-metadata memoization only (same contract as tables.load_table):
# every action still scans the stored parquet. Deliberately NOT in
# operators/ann_index.py: read_ivf_pq_index there must stay
# mutation-safe (tests interleave maintenance ops with fresh reads).
_FROZEN_IVFPQ_READS: dict = {}


def _read_frozen_index(spark: SparkSession, path: str):
    from map_reduce_library_spark.operators.ann_index import (
        read_ivf_pq_index,
    )

    key = (spark.sparkContext.applicationId, path)
    idx = _FROZEN_IVFPQ_READS.get(key)
    if idx is None:
        idx = read_ivf_pq_index(spark, path)
        _FROZEN_IVFPQ_READS[key] = idx
    return idx


def _persisted_index_path(spark: SparkSession, sf_dir: str,
                          variant: str) -> str:
    import atexit
    import shutil
    import tempfile

    from map_reduce_library_spark.operators.ann_index import (
        append_ivf_pq_index,
        build_ivf_pq_index,
        delete_from_ivf_pq_index,
        rebalance_ivf_pq_index,
        write_ivf_pq_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir, variant)
    path = _PERSISTED_IVFPQ.get(key)
    if path is None:
        emb = load_table(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix=f"mrls_ivfpq_{variant}_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        if variant == "incremental":  # FAISS train-then-add
            write_ivf_pq_index(
                build_ivf_pq_index(
                    emb.where(F.col("vec_id") < PQ_TRAIN_MAX),
                    EMB_DIM,
                    n_centroids=N_CENTROIDS,
                ),
                path,
            )
            append_ivf_pq_index(
                spark, path,
                emb.where(F.col("vec_id") >= PQ_TRAIN_MAX), EMB_DIM,
            )
        elif variant == "full":
            # the one expensive base build of the session: codebook
            # Lloyd fit + full-corpus encode. Carries label metadata
            # into the stored cells so the unfiltered AND filtered
            # serve queries read ONE artifact (metadata columns are
            # free for the unfiltered path — it projects them away).
            write_ivf_pq_index(
                build_ivf_pq_index(
                    emb, EMB_DIM, n_centroids=N_CENTROIDS,
                    metadata_cols=["label"],
                ),
                path,
            )
        else:
            # "deleted"/"rebalanced" DERIVE from a copy of the full
            # artifact instead of re-running the build (VERDICT r11
            # item 6: pass 1 built four indexes from scratch; the
            # mutation ops are exactly the production shape — you
            # delete from / rebalance THE index you have, not a
            # rebuilt twin). Copying keeps the artifacts independent
            # (each query's plan pins file listings of its own path).
            # Both ops preserve the metadata column the base carries
            # (rebalance moves rows losslessly; delete's anti-join
            # keeps survivor rows whole), and the serve queries
            # project it away — answers identical to a from-scratch
            # build, as the unchanged oracles prove.
            shutil.copytree(
                _persisted_index_path(spark, sf_dir, "full"), path,
                dirs_exist_ok=True,
            )
            if variant == "deleted":  # FAISS remove_ids
                delete_from_ivf_pq_index(
                    spark, path,
                    emb.where(_pq_delete_pred()).select("vec_id"),
                )
            elif variant == "rebalanced":
                # split every cell above 2×PQ_REBALANCE_TARGET rows
                # (at sf0.01: ~9 of the 16 seed cells split, ~2.5×
                # more centroids) — codes untouched, pruning geometry
                # re-cut; the serve query proves it via the
                # centroid-independent brute-ADC oracle
                rebalance_ivf_pq_index(
                    spark, path,
                    target_rows_per_cell=PQ_REBALANCE_TARGET,
                )
            else:
                raise ValueError(f"unknown index variant {variant!r}")
        _PERSISTED_IVFPQ[key] = path
    return path


@register("ivf_pq_persisted_topk", oracle=_ivf_pq_oracle())
def ivf_pq_persisted_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ served from a PERSISTED index: the four index tables
    (centroids/codebooks/cells/codes) are built and written to
    parquet ONCE per session, and the query plan starts from scans of
    the stored relations — load → assign queries to stored centroids
    → ADC against stored codes. Oracle is byte-identical to
    ``ivf_pq_topk``'s: the persisted artifact must reproduce the
    in-session answer exactly (``tests/test_ann_index.py``
    additionally proves a FRESH session serves the same answer)."""
    from map_reduce_library_spark.operators.ann_index import (
        ivf_pq_search,
        read_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(
        _read_frozen_index(
            spark, _persisted_index_path(spark, sf_dir, "full")
        ),
        emb.where(F.col("vec_id") < N_QUERIES),
        TOPK,
        EMB_DIM,
        n_probe=N_PROBE,
    )


@register(
    "ivf_pq_filtered_topk",
    oracle=_ivf_pq_oracle(filter_col="label"),
)
def ivf_pq_filtered_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED search over the persisted compressed index
    (the "tenant/language filter + ANN" production pattern,
    compressed-path edition): the stored cells carry the label
    column, so a query pairs only with same-label candidates INSIDE
    the candidate hash equi-join — the filter prunes before any
    distance math, and at warehouse scale it is the cells table's
    partition column (partition pruning does the filtering before the
    join even scans). Complements ``filtered_cosine_topk`` (the
    exact-float sibling); same shared full-build artifact as
    ``ivf_pq_persisted_topk``."""
    from map_reduce_library_spark.operators.ann_index import (
        ivf_pq_search,
        read_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(
        _read_frozen_index(
            spark, _persisted_index_path(spark, sf_dir, "full")
        ),
        emb.where(F.col("vec_id") < N_QUERIES),
        TOPK,
        EMB_DIM,
        n_probe=N_PROBE,
        filter_cols=["label"],
    )


@register(
    "ivf_pq_deleted_topk",
    oracle=_ivf_pq_oracle(corpus_pred=PQ_DELETE_PRED_SQL),
)
def ivf_pq_deleted_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining index-lifecycle op, deletes (FAISS remove_ids):
    a ~14% id slice is removed from the persisted index's row tables
    by anti-join rewrite — the fitted centroids/codebooks stay
    trained on the pre-deletion corpus (deletion never re-fits, same
    frozen-artifact contract as append) — and top-k is served from
    the surviving rows. The oracle keeps the full-corpus Lloyd fit
    and restricts only index MEMBERSHIP, so hash-green proves deleted
    vectors are gone from every answer while quantization is
    untouched."""
    from map_reduce_library_spark.operators.ann_index import (
        ivf_pq_search,
        read_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(
        _read_frozen_index(
            spark, _persisted_index_path(spark, sf_dir, "deleted")
        ),
        emb.where(F.col("vec_id") < N_QUERIES),
        TOPK,
        EMB_DIM,
        n_probe=N_PROBE,
    )


@register(
    "ivf_pq_incremental_topk",
    oracle=_ivf_pq_oracle(train_max=PQ_TRAIN_MAX),
)
def ivf_pq_incremental_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index growth, the FAISS train-then-add discipline:
    the index is fit on the first PQ_TRAIN_MAX = 250 vectors, written,
    then the REST of the corpus is appended by encoding against the
    FROZEN codebooks and assigning against the FROZEN centroids — the
    existing corpus is never rescanned and the fit never reruns
    (build+append once per session; the query serves from the stored
    relations). The oracle fits the Lloyd codebooks on the same train
    slice and encodes everything with them, so hash-green here proves
    append == batch-build-with-frozen-train exactly."""
    from map_reduce_library_spark.operators.ann_index import (
        ivf_pq_search,
        read_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(
        _read_frozen_index(
            spark, _persisted_index_path(spark, sf_dir, "incremental")
        ),
        emb.where(F.col("vec_id") < N_QUERIES),
        TOPK,
        EMB_DIM,
        n_probe=N_PROBE,
    )


@register(
    "ivf_pq_rebalanced_topk",
    oracle=_ivf_pq_oracle(full_probe=True),
)
def ivf_pq_rebalanced_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve from a REBALANCED index (VERDICT r10 item 1): the full
    build's hot cells are split by ``rebalance_ivf_pq_index`` (sub-
    centroids Lloyd-fit on PQ reconstructions, only split cells'
    directories rewritten), then top-k is served at FULL probe. The
    oracle is the centroid-independent brute ADC: with every cell
    probed, pruning is a no-op, so hash-green proves the layout op
    moved rows without creating, dropping, duplicating, or re-encoding
    any (a duplicated codes row would inflate its cosine by √2).
    Bounded-probe behavior on the re-cut geometry is pinned by
    ``tests/test_ann_index.py`` (pruning, crash healing, membership);
    the serve-cost restoration curve is measured by
    ``tools/scaling_probe.py --rebalance`` (BASELINE.md round 11)."""
    from map_reduce_library_spark.operators.ann_index import (
        ivf_pq_search,
        read_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(
        _read_frozen_index(
            spark, _persisted_index_path(spark, sf_dir, "rebalanced")
        ),
        emb.where(F.col("vec_id") < N_QUERIES),
        TOPK,
        EMB_DIM,
        n_probe=100_000,
    )


# ---- SemDeDup: clustered semantic deduplication ----------------------------

# Same family threshold as the LSH production path's
# COSINE_DUP_THRESHOLD (querydefs/dedup.py) — the synthetic
# embeddings' planted near-dups sit above it.
SEMDEDUP_TAU = 0.4


def _semdedup_oracle() -> str:
    cN = f"c{KMEANS_ITERS}"
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS nrm
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    {_kmeans_cents_ctes()},
    homed AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT e.vec_id, e.v, e.nrm, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.vc) / (e.nrm * c.nc)
                          DESC, c.cell) AS rn
        FROM e CROSS JOIN {cN} c) WHERE rn = 1
    ),
    pairs AS (
      SELECT b.vec_id, b.cell, a.vec_id AS keep_id,
             list_dot_product(b.v, a.v) / (b.nrm * a.nrm) AS cos_sim
      FROM homed b JOIN homed a
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_dot_product(b.v, a.v) / (b.nrm * a.nrm)
            >= {SEMDEDUP_TAU}
    )
    SELECT vec_id, cell, keep_id AS dup_of, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cos_sim DESC, keep_id) AS rn
      FROM pairs) WHERE rn = 1
    """


@register("semdedup_removals", oracle=_semdedup_oracle())
def semdedup_removals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by exact cosine
    WITHIN learned k-means clusters — blocking follows the data's
    density instead of random hyperplanes, so near-dups co-block with
    higher probability at equal block volume. Reuses the fitted
    codebook and IVF assignment checkpoints (the SemDeDup clustering
    IS the IVF index — one fit serves both search and dedup). The
    oracle unrolls the same Lloyd iterations, homes each vector, and
    replays the min-id-keeper policy, so the whole pipeline — fit,
    assignment, pair scoring, keeper choice — is hash-verified."""
    from map_reduce_library_spark.operators.similarity import (
        semdedup_removals,
    )

    return semdedup_removals(
        load_table(spark, sf_dir, "embeddings"),
        SEMDEDUP_TAU,
        n_centroids=N_CENTROIDS,
        assigned=shared_ivf_assigned(
            spark, sf_dir, n_probe=KMEANS_N_PROBE, fitted=True
        ),
    )


def _semdedup_centroid_far_oracle() -> str:
    cN = f"c{KMEANS_ITERS}"
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS nrm
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    {_kmeans_cents_ctes()},
    homed AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT e.vec_id, e.v, e.nrm, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.vc) / (e.nrm * c.nc)
                          DESC, c.cell) AS rn
        FROM e CROSS JOIN {cN} c) WHERE rn = 1
    ),
    ranked AS (
      SELECT h.vec_id, h.v, h.nrm, h.cell,
             ROW_NUMBER() OVER (PARTITION BY h.cell
               ORDER BY list_dot_product(h.v, c.vc) / (h.nrm * c.nc) ASC,
                        h.vec_id) AS r
      FROM homed h JOIN {cN} c ON h.cell = c.cell
    ),
    pairs AS (
      SELECT b.vec_id, b.cell, a.vec_id AS keep_id,
             list_dot_product(b.v, a.v) / (b.nrm * a.nrm) AS cos_sim
      FROM ranked b JOIN ranked a
        ON a.cell = b.cell AND a.r < b.r
      WHERE list_dot_product(b.v, a.v) / (b.nrm * a.nrm)
            >= {SEMDEDUP_TAU}
    )
    SELECT vec_id, cell, keep_id AS dup_of, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cos_sim DESC, keep_id) AS rn
      FROM pairs) WHERE rn = 1
    """


@register(
    "semdedup_removals_centroid_far",
    oracle=_semdedup_centroid_far_oracle(),
)
def semdedup_removals_centroid_far_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup with the PAPER-EXACT keeper (Abbas et al. 2023 §3:
    keep the duplicate-group member with the LOWEST cosine to its
    cluster centroid — the copy carrying the most information the
    centroid doesn't already represent). Same fitted codebook, same
    assignment checkpoint, same pair discovery as
    ``semdedup_removals``; only the keeper total order differs
    (centroid-distance rank instead of id), so the bench delta is the
    one extra broadcast join + ranking window over already-blocked
    cluster members (VERDICT r8 item 5)."""
    from map_reduce_library_spark.operators.similarity import (
        semdedup_removals_centroid_far,
    )

    return semdedup_removals_centroid_far(
        load_table(spark, sf_dir, "embeddings"),
        SEMDEDUP_TAU,
        centroids=shared_kmeans_centroids(spark, sf_dir),
        n_centroids=N_CENTROIDS,
        assigned=shared_ivf_assigned(
            spark, sf_dir, n_probe=KMEANS_N_PROBE, fitted=True
        ),
    )


# (applicationId, sf_dir) -> accumulated pairs dir of a REAL streaming
# SemDeDup ingest run. Same write-once/read-many policy as
# _PERSISTED_IVFPQ: the persisted member index + pairs table are the
# artifact; scratch dirs removed at interpreter exit.
_SEMDEDUP_INGEST: dict = {}


def _semdedup_ingest_pairs_dir(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from map_reduce_library_spark.operators.pipeline import hash_bucket
    from map_reduce_library_spark.streaming.semdedup_ingest import (
        run_incremental_semdedup_ingest,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _SEMDEDUP_INGEST.get(key)
    if path is None:
        emb = load_table(spark, sf_dir, "embeddings")
        root = tempfile.mkdtemp(prefix="mrls_semdedup_ingest_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        chunks = f"{root}/chunks"
        b = hash_bucket("vec_id", 3)
        for tick in range(3):
            emb.where(b == tick).coalesce(1).write.mode("append").parquet(
                chunks
            )
        path = run_incremental_semdedup_ingest(
            spark, chunks, f"{root}/work", SEMDEDUP_TAU,
            train=emb, n_centroids=N_CENTROIDS, compact_every=2,
        )
        _SEMDEDUP_INGEST[key] = path
    return path


@register("semdedup_ingest_verdict", oracle=_semdedup_oracle())
def semdedup_ingest_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING member-index SemDeDup path, verdict-granular
    (VERDICT r9 item 6): the embeddings corpus is drained through the
    real readStream/foreachBatch ingest (3 deterministic hash-split
    tick files; frozen centroids fit once as the train step; each
    tick probes ONLY the persisted per-cluster member index, never a
    corpus rescan; the member/pairs tables are compacted mid-stream),
    and the verdicts — for each removed vector, its home cell, best
    evictor, and cosine — are derived from the ACCUMULATED pairs
    table with the same min-id keeper window as the batch path.
    Oracle is ``semdedup_removals``'s, verbatim: by the convergence
    contract (union of tick pair-sets over ANY batch partitioning ==
    batch ``semdedup_pairs`` under the same frozen centroids;
    tests/test_semdedup_ingest.py), the streaming path must
    hash-match the batch answer exactly — fit, assignment, pair
    discovery, replay dedup, compaction, and keeper policy all sit on
    the verified path."""
    from pyspark.sql.window import Window

    from map_reduce_library_spark.streaming.semdedup_ingest import (
        semdedup_pairs_table,
    )

    pairs = semdedup_pairs_table(
        spark, _semdedup_ingest_pairs_dir(spark, sf_dir)
    )
    w = Window.partitionBy("rm_id").orderBy(
        F.col("cos_sim").desc(), F.col("keep_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("rm_id").alias("vec_id"),
            "cell",
            F.col("keep_id").alias("dup_of"),
            "cos_sim",
        )
    )
