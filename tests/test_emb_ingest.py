"""Incremental embedding dedup: the operator's convergence contract
and its streaming foreachBatch pipeline (the semantic twin of
tests/test_incremental_dedup.py — same claims, vector path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.pipeline import hash_bucket
from map_reduce_library_spark.operators.similarity import (
    banded_signatures,
    embedding_dup_pairs_lsh,
    incremental_emb_pairs,
)
from map_reduce_library_spark.streaming.emb_ingest import (
    _SIG_SCHEMA,
    emb_pairs_table,
    ingest_emb_batch,
    run_incremental_emb_ingest,
)
from tests.conftest import SF_SMOKE

THRESHOLD = 0.4
DIM = 64


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _pairs_set(df):
    return {(r.vec_a, r.vec_b, r.cosine) for r in df.collect()}


def test_single_tick_equals_batch_restriction(spark):
    emb = _emb(spark)
    b = hash_bucket("vec_id")
    incoming = emb.where(b < 10)
    index = banded_signatures(emb.where(b >= 10), DIM)
    got = _pairs_set(
        incremental_emb_pairs(index, incoming, THRESHOLD, DIM)
    )

    new_ids = {r.vec_id for r in incoming.select("vec_id").collect()}
    full = _pairs_set(embedding_dup_pairs_lsh(emb, THRESHOLD, DIM))
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == want
    assert got, "fixture has no near-dup touching the batch"


def test_ticks_union_to_batch_answer_and_are_disjoint(spark):
    emb = _emb(spark)
    b = hash_bucket("vec_id", 3)
    index = spark.createDataFrame([], _SIG_SCHEMA)
    emitted = []
    for tick in range(3):
        batch = emb.where(b == tick)
        emitted.append(
            _pairs_set(
                incremental_emb_pairs(index, batch, THRESHOLD, DIM)
            )
        )
        index = index.unionByName(banded_signatures(batch, DIM))
    union = set().union(*emitted)
    assert union == _pairs_set(
        embedding_dup_pairs_lsh(emb, THRESHOLD, DIM)
    )
    assert sum(len(e) for e in emitted) == len(union), (
        "a pair was emitted by more than one tick"
    )


def test_streaming_ingest_converges_to_batch_answer(spark, tmp_path):
    emb = _emb(spark)
    b = hash_bucket("vec_id", 3)
    chunks = tmp_path / "chunks"
    for tick in range(3):
        emb.where(b == tick).coalesce(1).write.mode("append").parquet(
            str(chunks)
        )
    work = tmp_path / "work"
    pairs_dir = run_incremental_emb_ingest(
        spark, str(chunks), str(work), THRESHOLD, DIM, compact_every=2
    )
    got = _pairs_set(emb_pairs_table(spark, pairs_dir))
    assert got == _pairs_set(embedding_dup_pairs_lsh(emb, THRESHOLD, DIM))

    # persisted index covers every nonzero-norm vector
    sig = spark.read.parquet(str(work / "sig_index"))
    assert (
        sig.select("vec_id").distinct().count()
        == banded_signatures(emb, DIM).select("vec_id").distinct().count()
    )


def test_replayed_tick_is_idempotent_for_readers(spark, tmp_path):
    """At-least-once redelivery AFTER the sig append: the own-vec_id
    probe exclusion recomputes byte-identical rows; reader dedup
    restores the exact batch answer."""
    emb = _emb(spark)
    b = hash_bucket("vec_id", 3)
    sig_dir = str(tmp_path / "sig_index")
    pairs_dir = str(tmp_path / "pairs")
    for tick in range(3):
        ingest_emb_batch(
            emb.where(b == tick), sig_dir, pairs_dir, THRESHOLD, DIM
        )
        if tick == 1:
            ingest_emb_batch(
                emb.where(b == tick), sig_dir, pairs_dir, THRESHOLD, DIM
            )
    got = _pairs_set(emb_pairs_table(spark, pairs_dir))
    assert got == _pairs_set(embedding_dup_pairs_lsh(emb, THRESHOLD, DIM))


def test_zero_norm_vectors_never_enter_the_index(spark, tmp_path):
    """A padding/failed-featurization all-zero vector has no direction;
    _prep drops it on BOTH the batch and (therefore) the index path,
    so it neither errors under ANSI division nor matches anything."""
    rows = [(1, [1.0] * DIM, 0), (2, [0.0] * DIM, 0), (3, [1.0] * DIM, 1)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    sig_dir = str(tmp_path / "sig")
    pairs_dir = str(tmp_path / "pairs")
    ingest_emb_batch(
        emb.where(F.col("vec_id") <= 2), sig_dir, pairs_dir, THRESHOLD, DIM
    )
    ingest_emb_batch(
        emb.where(F.col("vec_id") == 3), sig_dir, pairs_dir, THRESHOLD, DIM
    )
    sig_ids = {
        r.vec_id
        for r in spark.read.parquet(sig_dir).select("vec_id").collect()
    }
    assert 2 not in sig_ids
    got = _pairs_set(emb_pairs_table(spark, pairs_dir))
    assert got == {(1, 3, 1.0)}
