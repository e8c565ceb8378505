#!/usr/bin/env python
"""Persisted IVF-PQ index lifecycle, end to end: the vector-serving
workflow a retrieval or dedup deployment runs (operators/ann_index.py).

    initial corpus ─ build (train once) ─ write ──┐
                                                  ├─ read → search
    new vectors ──── append (frozen artifacts) ───┤   (cell-pruned,
    retired ids ──── delete (rename protocol) ────┤    metadata-
    grown cells ──── rebalance (split hot cells) ─┤    filterable)
    small files ──── compact (per cell dir) ──────┘

Everything after `build` touches only the four parquet tables —
centroids/codebooks (tiny, broadcast) and cells/codes (hive-
partitioned by cell, so a query's probed cells map to file-pruned
reads). The float corpus is never rescanned: appends encode against
the FROZEN codebooks, deletes rewrite the row tables by anti-join,
and a fresh session serves the same answers from the artifacts alone.

Usage: python examples/persisted_ann_index.py OUT_DIR [SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_library_spark.operators.ann_index import (  # noqa: E402
    append_ivf_pq_index,
    build_ivf_pq_index,
    compact_ivf_pq_index,
    delete_from_ivf_pq_index,
    ivf_pq_search,
    read_ivf_pq_index,
    rebalance_ivf_pq_index,
    write_ivf_pq_index,
)
from map_reduce_library_spark.session import get_session  # noqa: E402

DIM = 64
K = 5


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_index_example"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_session(app_name="persisted-ann-index-example")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(Path(out) / "ivfpq")

    # 1. TRAIN + BUILD on the initial corpus; carry `label` into the
    #    stored cells so searches can filter by metadata without
    #    touching the source table.
    initial = emb.where(F.col("vec_id") < 250)
    write_ivf_pq_index(
        build_ivf_pq_index(
            initial, DIM, n_centroids=16, metadata_cols=["label"]
        ),
        path,
    )
    print(f"built: {path} over {initial.count()} vectors")

    # 2. APPEND later arrivals — assigned/encoded against the FROZEN
    #    centroids/codebooks; the existing rows are never rescanned,
    #    and a crash-retried (replayed) batch is row-idempotent.
    late = emb.where(F.col("vec_id") >= 250)
    append_ivf_pq_index(spark, path, late, DIM)
    print(f"appended: {late.count()} vectors")

    # 3. SERVE — a fresh read of the artifacts; probed cells become a
    #    partition filter on both row-table scans.
    idx = read_ivf_pq_index(spark, path)
    queries = emb.where(F.col("vec_id") < 10)
    topk = ivf_pq_search(idx, queries, K, DIM, n_probe=2)
    print("unfiltered top-k sample:")
    topk.orderBy("query_id", "rnk").show(10, truncate=False)

    filtered = ivf_pq_search(
        idx, queries, K, DIM, n_probe=2, filter_cols=["label"]
    )
    print(f"label-filtered pairs: {filtered.count()}")

    # 4. DELETE retired vectors — anti-join rewrite via the rename
    #    protocol; fitted artifacts untouched, answers never name a
    #    deleted id again.
    retired = emb.where(F.col("vec_id") % 17 == 3).select("vec_id")
    delete_from_ivf_pq_index(spark, path, retired)
    after = read_ivf_pq_index(spark, path)
    print(f"deleted {retired.count()} ids; cells now {after.cells.count()}")

    # 5. MAINTAIN — rebalance splits cells the appends inflated past a
    #    row bound (sub-centroids fit on PQ reconstructions; only the
    #    split directories rewrite), restoring the n_probe × cell-size
    #    serve bound; compaction then folds file residue back toward
    #    one file per cell. Every maintenance op holds the _LEASE
    #    sentinel, so a concurrent second writer raises loudly.
    n_split = rebalance_ivf_pq_index(spark, path, target_rows_per_cell=15)
    print(f"rebalanced: {n_split} hot cells split")
    n_files = compact_ivf_pq_index(spark, path, full=True)
    print(f"compacted: {n_files} data files across the row tables")
    after = read_ivf_pq_index(spark, path)  # re-read post-swap

    served = ivf_pq_search(after, queries, K, DIM, n_probe=2)
    assert served.join(retired, served.neighbor_id == retired.vec_id).count() == 0
    print("post-delete serve never returns a deleted neighbor — done")


if __name__ == "__main__":
    main()
