"""Hybrid retrieval: reciprocal-rank fusion (RRF) of heterogeneous
rankers — the standard way to combine lexical (BM25) and semantic
(embedding ANN) search without score calibration.

RRF (Cormack, Clarke & Buettcher 2009): fused(d) = Σ_r 1/(k + rank_r(d))
over the rankers that returned d, k=60 by convention. Rank-based, so
the rankers' score scales never need reconciling — which is exactly
why it is the default fusion in production hybrid search.

Scale shape: each ranker's contribution is its own bounded top-N list
(the expensive part — BM25 term-filter scoring, ANN index probes —
is each ranker's already-audited plan); fusion itself joins N-row
relations, constant work. Ranks are assigned over score-DESC with an
id tie-break so the fused output is deterministic across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60


def ranked(
    df: DataFrame, score_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Attach 1-based rank by (score desc, id). The input is a
    ranker's bounded top-N list, so the unpartitioned window sorts N
    rows, not the corpus."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return df.withColumn("rnk", F.row_number().over(w))


def rrf_fuse(
    rankings: dict[str, DataFrame],
    top_k: int,
    k: int = RRF_K,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Fuse named rankings (each: id_col + rank_col) into
    (id, <name>_rnk..., rrf_score), top_k by fused score.

    Full outer joins keep documents any single ranker found; each
    1/(k+rank) term is added in dict order, so the double-precision
    sum is bit-identical across engines evaluating the same fixed
    expression. Rounded to 9 dp before the final cut (the corpus-wide
    reproducible-ranking convention, see bm25_topk)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused: DataFrame | None = None
    for name, r in rankings.items():
        part = r.select(
            F.col(id_col), F.col(rank_col).alias(f"{name}_rnk")
        )
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    score = None
    for name in rankings:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rnk")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.withColumn("rrf_score", F.round(score, 9))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(top_k)
    )
