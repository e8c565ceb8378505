"""Streaming incremental SEMDEDUP ingestion — the learned-cluster
sibling of ``streaming/emb_ingest.py`` (hyperplane-LSH) and
``streaming/ingest_dedup.py`` (MinHash); read those docstrings for
the delivery-semantics argument, which transfers layer for layer:

    (train step, once) kmeans fit on the initial corpus → centroids/
    readStream(embeddings, 1 file per trigger)         -- tick
      → foreachBatch:
          new_members = assign batch to FROZEN centroids (broadcast)
          pairs = new_members ⋈ member-index on cell  (+ in-batch)
          append pairs        → pairs/    (parquet)
          append new_members  → members/  (parquet — the persisted
                                           per-cluster member index:
                                           vec + norm + home cell)

Replay safety (foreachBatch is at-least-once): the probe excludes
the batch's own vec_ids from the probed index via broadcast
anti-join, so a redelivered tick recomputes byte-identical pair rows
and the reader's dropDuplicates absorbs the duplicate append.

The centroids are FROZEN at ingest time by design (the FAISS
train-then-add discipline, same as ``ann_index.append_ivf_pq_index``)
— re-fitting on ingest would re-home the whole corpus, which is a
rebuild, not an append. The SemDeDup K∝N scaling knob (BASELINE.md
§round-8) is therefore operated by periodic REBUILDS at compaction
boundaries, not per tick.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.similarity import (
    incremental_semdedup_pairs,
    ivf_assign_cells,
    kmeans_centroids,
)
from map_reduce_library_spark.streaming._util import (
    drain_one_file_per_tick,
    read_or_empty,
)

_MEMBER_SCHEMA = "vec_id bigint, v array<double>, nrm double, cell bigint"


def ingest_semdedup_batch(
    batch: DataFrame,
    members_dir: str,
    pairs_dir: str,
    tau: float,
    centroids: DataFrame,
) -> None:
    """One SemDeDup ingest tick: emit within-cluster duplicate pairs
    touching this batch, then append the batch's members to the
    index. Probe excludes the batch's own vec_ids (replay guard); the
    batch is assigned ONCE (localCheckpoint) for the probe's two
    references + the index append."""
    spark = batch.sparkSession
    own_ids = F.broadcast(batch.select("vec_id").distinct())
    index_members = read_or_empty(spark, members_dir, _MEMBER_SCHEMA).join(
        own_ids, "vec_id", "left_anti"
    )
    new_members = (
        ivf_assign_cells(batch, 0, n_probe=1, centroids=centroids)
        .where(F.col("probe_rank") == 1)
        .select("vec_id", "v", "nrm", "cell")
        .localCheckpoint(eager=True)
    )
    pairs = incremental_semdedup_pairs(
        index_members, batch, tau, centroids,
        incoming_members=new_members,
    )
    pairs.write.mode("append").parquet(pairs_dir)
    new_members.write.mode("append").parquet(members_dir)


def run_incremental_semdedup_ingest(
    spark: SparkSession,
    chunks_dir: str,
    work_dir: str,
    tau: float,
    train: DataFrame,
    n_centroids: int = 16,
    compact_every: int | None = 16,
) -> str:
    """Drain ``chunks_dir`` (one parquet file per tick) through the
    SemDeDup ingest pipeline. ``train`` fits the centroids ONCE
    (written to ``work_dir``/centroids — the persisted train
    artifact); every tick assigns against that frozen codebook.
    Returns the pairs table path."""
    from map_reduce_library_spark.operators.maintenance import (
        compact_index,
    )

    members_dir = os.path.join(work_dir, "members")
    pairs_dir = os.path.join(work_dir, "pairs")
    centroids_dir = os.path.join(work_dir, "centroids")

    kmeans_centroids(train, n_centroids).write.mode("overwrite").parquet(
        centroids_dir
    )
    centroids = spark.read.parquet(centroids_dir)

    def _tick(bdf: DataFrame, batch_id: int) -> None:
        ingest_semdedup_batch(bdf, members_dir, pairs_dir, tau, centroids)
        if compact_every and (batch_id + 1) % compact_every == 0:
            for d in (members_dir, pairs_dir):
                compact_index(bdf.sparkSession, d)

    drain_one_file_per_tick(
        spark, chunks_dir, os.path.join(work_dir, "checkpoint"), _tick
    )
    return pairs_dir


def semdedup_pairs_table(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Accumulated (keep_id, rm_id, cell, cos_sim) pairs;
    dropDuplicates makes replayed ticks reader-idempotent (replayed
    rows are byte-identical by the probe-exclusion argument)."""
    return spark.read.parquet(pairs_dir).dropDuplicates(
        ["keep_id", "rm_id"]
    )
