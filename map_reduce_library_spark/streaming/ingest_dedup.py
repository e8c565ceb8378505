"""Streaming incremental near-dup ingestion: the batch operator
``operators.dedup.incremental_lsh_pairs`` run as a live pipeline.

Topology (the production shape for continuous corpus ingestion):

    readStream(docs, 1 file per trigger)        -- each file = one tick
      → foreachBatch:
          new_bands = bands(minhash(shingles(batch)))
          pairs     = new_bands ⋈ band-index      (+ in-batch self-join)
          append pairs      → pairs/   (parquet)
          append new_bands  → index/   (parquet — the persisted corpus
                                        signature index, append-only)

Why foreachBatch and not a stateful streaming operator: the band index
is unbounded corpus state that must outlive the stream and be readable
by other jobs (the batch dedup family reads the same table), so it
belongs in a table, not in the state store — exactly the Structured
Streaming idiom for "stream joined against a growing external table".

Delivery semantics: foreachBatch is AT-LEAST-ONCE, not transactional —
a crash between the parquet appends and the checkpoint commit
redelivers the tick. The pipeline is replay-safe in two layers
(pinned by the replay tests in tests/test_incremental_dedup.py):

1. CONTENT idempotence: every probe excludes the batch's own doc_ids
   from the probed index (an index entry with a probing doc's own id
   is the doc itself, never a duplicate — a no-op join on first
   delivery, and on replay it removes exactly the first attempt's
   entries), so a replayed tick recomputes byte-identical pairs,
   verdict, band, and digest rows. Without the exclusion a replayed
   verdict probe would match every batch doc against its own
   first-attempt digests and flip genuinely-new texts to
   is_kept=False (ADVICE r5).
2. READER idempotence: replay appends duplicate copies of those
   identical rows; the reader views (``dedup_pairs_table``,
   ``dedup_verdict_table``) deduplicate, and the index tables are
   only consumed through min/groupBy aggregates that are
   duplicate-idempotent.

Convergence invariant (pinned by tests/test_incremental_dedup.py):
after the stream drains, pairs/ holds EXACTLY the full-corpus batch
``minhash_lsh_pairs`` answer, regardless of how documents were split
into ticks or the order ticks arrived — cross-tick pairs are emitted
when their later side arrives, in-tick pairs by the self-join. This is
what makes the operator safe to run incrementally at 100 TB: no
re-scan of the corpus, no pair ever lost or double-counted
(pairs are distinct per tick and ticks contribute disjoint pair sets
because each pair's later-arriving side fixes its tick).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.dedup import (
    incremental_exact_verdict,
    incremental_lsh_pairs,
    lsh_bands,
    minhash_signature,
    shingles,
    text_digests,
)
from map_reduce_library_spark.streaming._util import (
    drain_one_file_per_tick,
    read_or_empty as _read_or_empty,
)

_BAND_SCHEMA = "doc_id bigint, band_id int, band_sig string"
_DIGEST_SCHEMA = "d_md5 string, d_len int, doc_id bigint"


def _new_bands(batch: DataFrame) -> DataFrame:
    return lsh_bands(minhash_signature(shingles(batch)))


def ingest_batch(
    batch: DataFrame,
    index_dir: str,
    pairs_dir: str,
    digest_dir: str | None = None,
    verdict_dir: str | None = None,
) -> None:
    """Process one ingest tick: emit near-dup pairs touching this
    batch, then append the batch's bands to the band index; with
    ``digest_dir``/``verdict_dir`` set, also run exact dedup against
    the digest index and append this tick's keep/drop verdicts. Order
    matters — each probe must see its index WITHOUT this batch
    (self-pairs come from the in-batch join; the exact verdict's
    batch_rep handles in-batch copies)."""
    spark = batch.sparkSession
    # Replay guard (foreachBatch is at-least-once): probe indexes
    # WITHOUT the batch's own doc_ids. First delivery: no-op (the
    # appends run after the probes). Redelivery: strips exactly the
    # first attempt's entries, so the recomputed pairs/verdict rows
    # are byte-identical and reader-side distinct absorbs the
    # duplicate append. Broadcast anti-join — a tick is bounded, the
    # index is not.
    own_ids = F.broadcast(batch.select("doc_id").distinct())
    index_bands = _read_or_empty(spark, index_dir, _BAND_SCHEMA).join(
        own_ids, "doc_id", "left_anti"
    )
    # Materialize the batch's bands ONCE: the pairs plan references
    # them three times (index probe + both self-join sides) and the
    # index append is a fourth consumer — without the checkpoint each
    # consumer re-runs the shingle→minhash pipeline, the dominant
    # per-tick cost.
    bands = _new_bands(batch).localCheckpoint(eager=True)
    pairs = incremental_lsh_pairs(index_bands, batch, incoming_bands=bands)
    pairs.write.mode("append").parquet(pairs_dir)
    bands.write.mode("append").parquet(index_dir)
    if digest_dir is not None and verdict_dir is not None:
        digests = _read_or_empty(spark, digest_dir, _DIGEST_SCHEMA).join(
            own_ids, "doc_id", "left_anti"
        )
        # Digest the batch ONCE (the bands pattern above): the verdict
        # references the digest relation three times and the index
        # append is a fourth consumer.
        batch_digests = text_digests(batch).localCheckpoint(eager=True)
        verdict = incremental_exact_verdict(
            digests, batch, incoming_digests=batch_digests
        )
        verdict.write.mode("append").parquet(verdict_dir)
        batch_digests.write.mode("append").parquet(digest_dir)


def compact_work_dir(
    spark: SparkSession, work_dir: str
) -> dict[str, int]:
    """Compact every table the ingest pipeline appends to, in place.
    All four are duplicate-idempotent for readers (module docstring),
    which is exactly the contract ``compact_index``'s monotone-
    superset crash-safety requires. Returns table -> file count."""
    from map_reduce_library_spark.operators.maintenance import (
        compact_index,
    )

    return {
        name: compact_index(spark, os.path.join(work_dir, name))
        for name in ("index", "digests", "pairs", "verdicts")
    }


def run_incremental_dedup_ingest(
    spark: SparkSession,
    chunks_dir: str,
    work_dir: str,
    compact_every: int | None = 16,
) -> str:
    """Drain ``chunks_dir`` (a directory of parquet files, one ingest
    tick each) through the incremental dedup pipeline. Returns the
    pairs table path. ``availableNow`` + ``maxFilesPerTrigger=1``
    replays the backlog one file per micro-batch and stops — the same
    code runs unbounded against a live landing directory or Kafka by
    swapping the trigger.

    Every ``compact_every`` ticks the band/digest indexes (and the
    pairs/verdict outputs) are compacted IN PLACE: each tick's
    ``mode("append")`` adds a file-set, so without maintenance the
    per-tick index probe becomes a many-small-files scan whose task-
    scheduling overhead grows linearly with tick count (VERDICT r6
    item 5). Compaction runs inside the serial foreachBatch callback
    — the single-writer window ``compact_index`` requires — and its
    crash-safety needs only the readers' duplicate-idempotence, which
    this pipeline already guarantees for replay reasons. Cadence is
    keyed on ``batch_id`` (monotone across restarts, checkpoint-
    tracked), so a restarted stream keeps the same schedule."""
    index_dir = os.path.join(work_dir, "index")
    pairs_dir = os.path.join(work_dir, "pairs")
    digest_dir = os.path.join(work_dir, "digests")
    verdict_dir = os.path.join(work_dir, "verdicts")

    def _tick(bdf: DataFrame, batch_id: int) -> None:
        ingest_batch(bdf, index_dir, pairs_dir, digest_dir, verdict_dir)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_work_dir(bdf.sparkSession, work_dir)

    drain_one_file_per_tick(
        spark, chunks_dir, os.path.join(work_dir, "checkpoint"), _tick
    )
    return pairs_dir


def dedup_pairs_table(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """The accumulated pairs table. Distinct defensively: ticks emit
    disjoint pair sets by construction, so this is a no-op guard that
    also makes re-delivered micro-batches (failure replay) idempotent
    for readers."""
    return (
        spark.read.parquet(pairs_dir)
        .select("doc_a", "doc_b")
        .distinct()
    )


def dedup_verdict_table(spark: SparkSession, verdict_dir: str) -> DataFrame:
    """The accumulated keep/drop verdict table. A replayed tick
    appends byte-identical verdict rows (the probe excluded the
    batch's own first-attempt digests, so the recomputation sees the
    same index state) — whole-row distinct restores
    exactly-one-row-per-ingested-doc for readers."""
    return spark.read.parquet(verdict_dir).distinct()
