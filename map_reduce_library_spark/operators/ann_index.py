"""Persisted IVF-PQ index lifecycle: build → write → load → search →
incremental append.

``pq_encode``'s relation (m small-int codes per vector) is only an
index once it OUTLIVES the session that fit it. This module gives the
IVF-PQ family the same persisted-artifact discipline the text-LSH
side already has (``streaming/emb_ingest.py`` writes its signature
index to parquet; ``operators/maintenance.compact_index`` maintains
it): the fitted index is four parquet tables under one directory,

    <path>/centroids   (cell bigint, vc array<double>, nc double)
    <path>/codebooks   (sub int, cell bigint, vc array<double>)
    <path>/cells       (vec_id, cell)          -- home cell per vector
    <path>/codes       (vec_id, sub, code)     -- PQ codes per vector

and a fresh session serves top-k from those tables alone — the float
corpus is touched only on the (bounded) query side. Appending new
vectors follows the FAISS ``train``-then-``add`` discipline: encode
against the FROZEN codebooks and assign against the FROZEN coarse
centroids, append to ``cells``/``codes``, never re-fit (re-training
would silently re-code the whole corpus; at 100 TB that is a rebuild,
a deliberate operation, not an append). Because each vector's cell
and codes depend only on the frozen artifacts, build(A)+append(B) is
row-identical to build(A∪B, train=A) — the convergence contract
``tests/test_ann_index.py`` pins.

At 100 TB: ``cells``/``codes`` are id-and-small-int relations (the
memory story of ``ivf_pq_topk``); write them partitioned/bucketed by
``cell`` so a query's probed cells map to file-pruned reads.
``centroids``/``codebooks`` are tiny (≤ n_centroids and m×codes rows)
and broadcast at query time.

Reference: the reference engine (IdoSagiv/map-reduce-library) has no
vector ops — SURVEY.md §2D extension (VERDICT r8 next-round item 1).
"""

from __future__ import annotations

import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.similarity import (
    PQ_CODES,
    PQ_ITERS,
    PQ_M,
    _ivf_pq_adc_topk,
    _prep,
    ivf_assign_cells,
    pq_codebooks,
    pq_encode,
)


class IvfPqIndex(NamedTuple):
    """The four relations of a fitted IVF-PQ index (see module doc)."""

    centroids: DataFrame
    codebooks: DataFrame
    cells: DataFrame
    codes: DataFrame


_PARTS = ("centroids", "codebooks", "cells", "codes")


def seed_centroids(
    emb: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The deterministic seed coarse quantizer — first ``n_centroids``
    vectors by id, exactly the fallback ``ivf_assign_cells`` derives
    internally, materialized as an explicit (cell, vc, nc) relation so
    it can be WRITTEN (a persisted index must carry its own coarse
    quantizer; deriving it from "the corpus" again in a later session
    would silently drift once vectors are appended)."""
    base = _prep(emb, id_col, vec_col)
    return base.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).cast("long").alias("cell"),
        F.col("v").alias("vc"),
        F.col("nrm").alias("nc"),
    )


def build_ivf_pq_index(
    emb: DataFrame,
    dim: int,
    n_centroids: int = 16,
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    train: DataFrame | None = None,
    metadata_cols: list[str] | None = None,
) -> IvfPqIndex:
    """Fit the index over ``emb``: coarse centroids (``centroids`` if
    given, else the deterministic seed), per-subspace PQ codebooks
    Lloyd-fit on ``train`` (default: the whole corpus — pass a bounded
    sample at scale; the fit cost must not grow with the corpus), then
    one assignment + one encode pass over the full corpus.

    ``metadata_cols``: filterable attributes (tenant, language,
    label) carried INTO the stored ``cells`` relation — one equi-join
    against the source table at build time — so filtered search
    (``ivf_pq_search(filter_cols=...)``) prunes candidates by
    metadata inside the candidate equi-join, before any distance
    math; at warehouse scale these are the partition columns of the
    cells table."""
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(emb, n_centroids, id_col, vec_col)
    )
    cbs = pq_codebooks(
        train if train is not None else emb,
        dim, m, codes, iters, id_col=id_col, vec_col=vec_col,
    )
    cells = ivf_assign_cells(
        emb, n_centroids, id_col, vec_col, n_probe=1, centroids=cents
    ).select(id_col, "cell")
    if metadata_cols:
        cells = cells.join(
            emb.select(id_col, *metadata_cols), id_col
        )
    enc = pq_encode(emb, cbs, dim, m, id_col, vec_col)
    return IvfPqIndex(cents, cbs, cells, enc)


def write_ivf_pq_index(index: IvfPqIndex, path: str) -> None:
    """Persist all four relations under ``path``. ``overwrite`` on the
    fitted artifacts (a re-write is a rebuild); the row tables write
    ``overwrite`` too — appends go through ``append_ivf_pq_index``."""
    for name, df in zip(_PARTS, index):
        df.write.mode("overwrite").parquet(os.path.join(path, name))


def _heal_interrupted_delete(path: str) -> None:
    """Repair the observable crash states of ``delete_from_ivf_pq_
    index``'s rename protocol (monotone-superset, like
    ``compact_index``): a missing row table whose ``.<part>_old``
    sibling exists is restored to the PRE-DELETE state (a superset —
    the delete is lost, never data), and a leftover ``.<part>_rewrite``
    beside an intact table is discarded (incomplete staging; the
    source was never touched)."""
    import shutil

    for part in ("cells", "codes"):
        src = os.path.join(path, part)
        old = os.path.join(path, f".{part}_old")
        stage = os.path.join(path, f".{part}_rewrite")
        if not os.path.exists(src) and os.path.exists(old):
            os.rename(old, src)
        elif os.path.exists(src) and os.path.exists(old):
            # both present: crash AFTER the forward swap completed but
            # before the old copy was removed — src is authoritative
            shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(stage) and os.path.exists(src):
            shutil.rmtree(stage, ignore_errors=True)


def read_ivf_pq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    """Load a persisted index. Plain parquet reads — every query plan
    built on top starts from a scan of the stored relations, never
    from the float corpus. Heals crash residue first: interrupted
    deletes (``_heal_interrupted_delete``) and interrupted
    compactions — a ``.compact_tmp`` left inside a row table means a
    ``compact_index`` pass died mid-protocol and the table may hold
    transient duplicate rows, which the ADC scorer's per-neighbor
    SUMS would read as inflated cosines (unlike the dup-idempotent
    streaming index readers); forcing the full-dedup repair BEFORE
    serving closes that window (code-review r9)."""
    _heal_interrupted_delete(path)
    for part in ("cells", "codes"):
        if os.path.exists(os.path.join(path, part, ".compact_tmp")):
            from map_reduce_library_spark.operators.maintenance import (
                compact_index,
            )

            compact_index(spark, os.path.join(path, part), full=True)
    return IvfPqIndex(
        *(spark.read.parquet(os.path.join(path, n)) for n in _PARTS)
    )


def append_ivf_pq_index(
    spark: SparkSession,
    path: str,
    new_emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """FAISS-``add`` discipline: assign + encode ``new_emb`` against
    the index's FROZEN centroids/codebooks and append to the row
    tables. One broadcast-join pass over the new vectors — the
    existing corpus floats are never rescanned (the
    ``incremental_emb_pairs`` property, applied to the PQ index).

    REPLAY GUARD, PER TABLE (code-review r9, both rounds): ids
    already present in a row table are excluded from THAT table's
    append. Unlike the LSH signature index (whose duplicated rows
    only re-emit pair rows the reader dedups), the ADC scorer SUMS
    per-(query, neighbor) code contributions, so a duplicated codes
    row would inflate that neighbor's cosine by √2 silently — a
    crash-retried append must be row-idempotent. And the guard must
    be per-table, not keyed on the first-written table: a crash
    BETWEEN the cells and codes writes would otherwise make the retry
    a no-op and strand the batch in cells with no codes (invisible to
    every answer through the cand⋈encoded inner join). Each table's
    guard is one column-pruned scan of that table's id column,
    semi-joined against the (bounded, broadcast) batch ids; each
    fresh-rows plan feeds exactly one write, so nothing executes
    twice. Metadata columns the index was built with
    (``build_ivf_pq_index(metadata_cols=...)``) are carried through
    automatically — ``new_emb`` must supply them, or the appended
    files would fork the cells schema and appended rows would be
    invisible to filtered search (NULL never equi-joins)."""
    idx = read_ivf_pq_index(spark, path)
    metadata_cols = [
        c for c in idx.cells.columns if c not in (id_col, "cell")
    ]
    missing = [c for c in metadata_cols if c not in new_emb.columns]
    if missing:
        raise ValueError(
            f"index at {path} stores metadata columns {metadata_cols}; "
            f"the appended batch lacks {missing}"
        )
    batch_ids = F.broadcast(new_emb.select(F.col(id_col)).distinct())

    def _fresh_against(table: DataFrame) -> DataFrame:
        already = F.broadcast(
            table.select(id_col).join(batch_ids, id_col, "semi")
        )
        return new_emb.join(already, id_col, "left_anti")

    fresh_cells = _fresh_against(idx.cells)
    new_cells = ivf_assign_cells(
        fresh_cells, 0, id_col, vec_col, n_probe=1,
        centroids=idx.centroids,
    ).select(id_col, "cell")
    if metadata_cols:
        new_cells = new_cells.join(
            fresh_cells.select(id_col, *metadata_cols), id_col
        )
    new_cells.write.mode("append").parquet(os.path.join(path, "cells"))

    fresh_codes = _fresh_against(idx.codes)
    new_codes = pq_encode(
        fresh_codes, idx.codebooks, dim, m, id_col, vec_col
    )
    new_codes.write.mode("append").parquet(os.path.join(path, "codes"))


def delete_from_ivf_pq_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """FAISS ``remove_ids`` discipline: drop vectors from the row
    tables (cells + codes) by anti-join rewrite; the fitted artifacts
    (centroids, codebooks) are untouched — deletion never re-fits,
    exactly as append never re-fits (a codebook trained on since-
    deleted vectors is still a valid quantizer; re-training is a
    rebuild, a deliberate operation). ``ids`` is a one-column relation
    of ids to remove — broadcast against the row tables, one pass
    each.

    The rewrite is a rename protocol, not a delete-then-copy: the
    surviving rows are staged to a dot-dir INSIDE ``path`` (same
    filesystem, so each swap step is an atomic directory rename,
    never a cross-mount recursive copy), then
    ``src → .<part>_old``, ``.<part>_rewrite → src``, drop the old
    copy. Every crash-observable state is a SUPERSET of the
    post-delete rows (at worst the pre-delete table, i.e. the delete
    is lost and must be re-run — never corrupted or truncated) and is
    healed automatically by the next ``read_ivf_pq_index``
    (code-review r9; the monotone discipline of ``compact_index``).
    Parquet has no row deletes; at warehouse scale the same operation
    is a MERGE/DELETE into a log-structured table format. Readers in
    THIS session must re-read the path after the swap (plain parquet
    scans pin file listings at plan time)."""
    import shutil

    _heal_interrupted_delete(path)
    key = F.broadcast(ids.select(F.col(ids.columns[0]).alias(id_col)))
    for part in ("cells", "codes"):
        src = os.path.join(path, part)
        stage = os.path.join(path, f".{part}_rewrite")
        old = os.path.join(path, f".{part}_old")
        shutil.rmtree(stage, ignore_errors=True)
        (
            spark.read.parquet(src)
            .join(key, id_col, "left_anti")
            .write.mode("overwrite")
            .parquet(stage)
        )
        os.rename(src, old)
        os.rename(stage, src)
        shutil.rmtree(old)


def ivf_pq_search(
    index: IvfPqIndex,
    queries: DataFrame,
    k: int,
    dim: int,
    n_probe: int = 1,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_cols: list[str] | None = None,
) -> DataFrame:
    """Serve ADC top-k from a (persisted) index: the query vectors are
    assigned to their ``n_probe`` nearest stored centroids (broadcast
    join — the only place query floats appear), then scored against
    the stored codes via the shared ``_ivf_pq_adc_topk`` core. Row-
    identical to ``ivf_pq_topk`` when the index was built from the
    same corpus with the same geometry (the persisted-vs-in-session
    oracle equality ``ivf_pq_persisted_topk`` pins).

    ``filter_cols``: metadata-filtered search over the compressed
    index — the listed columns must exist on ``queries`` AND have
    been carried into the stored cells (``build_ivf_pq_index(
    metadata_cols=...)``); candidates then pair only on matching
    metadata, inside the same hash equi-join that matches cells
    (``ivf_pq_filtered_topk`` pins it against a relational oracle)."""
    filter_cols = list(filter_cols or [])
    q_assigned = ivf_assign_cells(
        queries, 0, id_col, vec_col, n_probe=n_probe,
        centroids=index.centroids,
    )
    if filter_cols:
        q_assigned = q_assigned.join(
            queries.select(id_col, *filter_cols), id_col
        )
    return _ivf_pq_adc_topk(
        q_assigned,
        index.cells.select(
            F.col(id_col).alias("neighbor_id"), "cell", *filter_cols
        ),
        index.codebooks,
        index.codes,
        k,
        dim,
        m=m,
        id_col=id_col,
        match_cols=filter_cols,
    )
