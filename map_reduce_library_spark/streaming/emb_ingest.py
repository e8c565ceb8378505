"""Streaming incremental EMBEDDING near-dup ingestion — the semantic
twin of ``streaming/ingest_dedup.py`` (same topology, same
convergence/replay contracts; read that module's docstring for the
full delivery-semantics argument):

    readStream(embeddings, 1 file per trigger)      -- tick
      → foreachBatch:
          new_sigs = banded_signatures(batch)        (T×P plane dots)
          pairs    = new_sigs ⋈ sig-index  (+ in-batch self-join)
          append pairs     → pairs/      (parquet)
          append new_sigs  → sig_index/  (parquet — the persisted LSH
                                          index: signature + vector +
                                          norm, probe-ready)

Replay safety (foreachBatch is at-least-once): the probe excludes the
batch's own vec_ids from the probed index via broadcast anti-join, so
a redelivered tick recomputes byte-identical pair rows and the
reader's dropDuplicates absorbs the duplicate append — layer-for-
layer the ingest_dedup argument, applied to vectors.

Maintenance: same in-place ``compact_index`` cadence — both tables
here are duplicate-idempotent for readers (pairs via distinct;
the sig index is consumed only through the probe join, where a
duplicated index row can only re-emit an identical pair row that the
reader dedup removes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.similarity import (
    banded_signatures,
    incremental_emb_pairs,
)
from map_reduce_library_spark.streaming._util import (
    drain_one_file_per_tick,
    read_or_empty,
)

_SIG_SCHEMA = (
    "vec_id bigint, v array<double>, nrm double, tbl int, sig string"
)


def ingest_emb_batch(
    batch: DataFrame,
    sig_index_dir: str,
    pairs_dir: str,
    threshold: float,
    dim: int,
) -> None:
    """One embedding ingest tick: emit near-dup pairs touching this
    batch, then append the batch's signatures to the index. Probe
    excludes the batch's own vec_ids (replay guard) and the batch is
    signed ONCE (localCheckpoint) for the probe's three references +
    the index append."""
    spark = batch.sparkSession
    own_ids = F.broadcast(batch.select("vec_id").distinct())
    index_sigs = read_or_empty(spark, sig_index_dir, _SIG_SCHEMA).join(
        own_ids, "vec_id", "left_anti"
    )
    sigs = banded_signatures(batch, dim).localCheckpoint(eager=True)
    pairs = incremental_emb_pairs(
        index_sigs, batch, threshold, dim, incoming_sigs=sigs
    )
    pairs.write.mode("append").parquet(pairs_dir)
    sigs.write.mode("append").parquet(sig_index_dir)


def run_incremental_emb_ingest(
    spark: SparkSession,
    chunks_dir: str,
    work_dir: str,
    threshold: float,
    dim: int,
    compact_every: int | None = 16,
) -> str:
    """Drain ``chunks_dir`` (one parquet file per tick) through the
    embedding ingest pipeline; returns the pairs table path. Same
    trigger/cadence semantics as ``run_incremental_dedup_ingest``."""
    from map_reduce_library_spark.operators.maintenance import (
        compact_index,
    )

    sig_index_dir = os.path.join(work_dir, "sig_index")
    pairs_dir = os.path.join(work_dir, "pairs")

    def _tick(bdf: DataFrame, batch_id: int) -> None:
        ingest_emb_batch(bdf, sig_index_dir, pairs_dir, threshold, dim)
        if compact_every and (batch_id + 1) % compact_every == 0:
            for d in (sig_index_dir, pairs_dir):
                compact_index(bdf.sparkSession, d)

    drain_one_file_per_tick(
        spark, chunks_dir, os.path.join(work_dir, "checkpoint"), _tick
    )
    return pairs_dir


def emb_pairs_table(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Accumulated (vec_a, vec_b, cosine) pairs; dropDuplicates makes
    replayed ticks reader-idempotent (replayed rows are
    byte-identical by the probe-exclusion argument above)."""
    return spark.read.parquet(pairs_dir).dropDuplicates(
        ["vec_a", "vec_b"]
    )
