"""Incremental (ingest-time) dedup: the batch operator and its
streaming foreachBatch pipeline.

Core claim under test (operators/dedup.py::incremental_lsh_pairs):
feeding the corpus through the pipeline in ANY tick partitioning
yields exactly the full-corpus batch ``minhash_lsh_pairs`` answer —
cross-tick pairs arrive with their later side, in-tick pairs from the
self-join, and no pair is emitted twice (each pair's later-arriving
side fixes the unique tick that emits it).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.dedup import (
    incremental_lsh_pairs,
    lsh_bands,
    minhash_lsh_pairs,
    minhash_signature,
    shingles,
)
from map_reduce_library_spark.operators.pipeline import hash_bucket
from map_reduce_library_spark.streaming.ingest_dedup import (
    dedup_pairs_table,
    ingest_batch,
    run_incremental_dedup_ingest,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _pairs_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_single_tick_equals_batch_restriction(spark):
    """One tick vs the 90% index == full-corpus pairs touching the
    incoming 10% (the same restriction the sf0.01 oracle states)."""
    docs = _docs(spark)
    b = hash_bucket("doc_id")
    incoming = docs.where(b < 10)
    existing = docs.where(b >= 10)
    index = lsh_bands(minhash_signature(shingles(existing)))
    got = _pairs_set(incremental_lsh_pairs(index, incoming))

    new_ids = {r.doc_id for r in incoming.select("doc_id").collect()}
    full = _pairs_set(minhash_lsh_pairs(docs))
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == want
    assert got, "fixture has no near-dup touching the batch; useless test"


def test_ticks_union_to_batch_answer_and_are_disjoint(spark):
    """Three-way split, processed tick by tick against a growing
    index: union == batch answer, tick outputs pairwise disjoint."""
    docs = _docs(spark)
    b = hash_bucket("doc_id", 3)
    empty = spark.createDataFrame(
        [], "doc_id bigint, band_id int, band_sig string"
    )
    index = empty
    emitted: list[set] = []
    for tick in range(3):
        batch = docs.where(b == tick)
        emitted.append(_pairs_set(incremental_lsh_pairs(index, batch)))
        index = index.unionByName(
            lsh_bands(minhash_signature(shingles(batch)))
        )
    union = set().union(*emitted)
    assert union == _pairs_set(minhash_lsh_pairs(docs))
    assert sum(len(e) for e in emitted) == len(union), (
        "a pair was emitted by more than one tick"
    )


def test_streaming_ingest_converges_to_batch_answer(spark, tmp_path):
    """End-to-end foreachBatch pipeline: 3 parquet files drained one
    per micro-batch; the accumulated pairs table equals the batch
    answer and the persisted band index covers the whole corpus."""
    docs = _docs(spark)
    b = hash_bucket("doc_id", 3)
    chunks = tmp_path / "chunks"
    for tick in range(3):
        docs.where(b == tick).coalesce(1).write.mode("append").parquet(
            str(chunks)
        )
    work = tmp_path / "work"
    pairs_dir = run_incremental_dedup_ingest(
        spark, str(chunks), str(work)
    )
    got = _pairs_set(dedup_pairs_table(spark, pairs_dir))
    assert got == _pairs_set(minhash_lsh_pairs(docs))

    # the persisted index covers every doc the batch pipeline would
    # band (docs too short to shingle band to nothing on both paths)
    index = spark.read.parquet(str(work / "index"))
    assert (
        index.select("doc_id").distinct().count()
        == lsh_bands(minhash_signature(shingles(docs)))
        .select("doc_id")
        .distinct()
        .count()
    )

    # the exact-dedup sidecar: one kept doc per distinct text across
    # all ticks, and the digest index covers the whole corpus
    verdicts = spark.read.parquet(str(work / "verdicts"))
    n_texts = docs.select("text").distinct().count()
    assert verdicts.where("is_kept").count() == n_texts
    assert verdicts.count() == docs.count()
    digests = spark.read.parquet(str(work / "digests"))
    assert digests.select("doc_id").distinct().count() == docs.count()


def test_replayed_tick_is_idempotent_for_readers(spark, tmp_path):
    """Failure-replay semantics: re-running a tick (foreachBatch
    at-least-once delivery) appends duplicate rows, but the reader
    view stays exactly the batch answer."""
    docs = _docs(spark)
    b = hash_bucket("doc_id", 3)
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    for tick in range(3):
        ingest_batch(docs.where(b == tick), index_dir, pairs_dir)
        if tick == 1:  # replay the middle tick
            ingest_batch(docs.where(b == tick), index_dir, pairs_dir)
    got = _pairs_set(dedup_pairs_table(spark, pairs_dir))
    assert got == _pairs_set(minhash_lsh_pairs(docs))


def test_replayed_tick_is_idempotent_for_verdicts(spark, tmp_path):
    """ADVICE r5 (medium): foreachBatch at-least-once redelivery of a
    tick AFTER its digest append must not flip verdicts — without the
    own-doc_id probe exclusion, every replayed doc matches its own
    first-attempt digests and genuinely-new texts get a contradicting
    is_kept=False row. The reader view must equal the no-replay run
    row for row, with exactly one kept doc per distinct text."""
    from map_reduce_library_spark.streaming.ingest_dedup import (
        dedup_verdict_table,
    )

    docs = _docs(spark)
    b = hash_bucket("doc_id", 3)

    def run(root, replay_tick):
        dirs = [str(root / d) for d in ("index", "pairs", "digests", "verdicts")]
        for tick in range(3):
            ingest_batch(docs.where(b == tick), *dirs)
            if tick == replay_tick:
                # crash-after-append redelivery: the digest index
                # already holds this tick's own digests
                ingest_batch(docs.where(b == tick), *dirs)
        return dirs[3]

    clean = run(tmp_path / "clean", replay_tick=None)
    replayed = run(tmp_path / "replayed", replay_tick=1)

    want = {tuple(r) for r in dedup_verdict_table(spark, clean).collect()}
    got = {tuple(r) for r in dedup_verdict_table(spark, replayed).collect()}
    assert got == want

    n_texts = docs.select("text").distinct().count()
    v = dedup_verdict_table(spark, replayed)
    assert v.count() == docs.count()
    assert v.where("is_kept").count() == n_texts


def test_exact_verdict_keeps_exactly_one_doc_per_text(spark):
    """Incremental exact dedup across ticks: every distinct text ends
    with EXACTLY one kept doc (the first-arrived representative), no
    matter how the corpus was split into batches."""
    from map_reduce_library_spark.operators.dedup import (
        incremental_exact_verdict,
        text_digests,
    )

    docs = _docs(spark)
    b = hash_bucket("doc_id", 3)
    empty = spark.createDataFrame([], "d_md5 string, d_len int, doc_id bigint")
    index = empty
    kept_ids: list[int] = []
    for tick in range(3):
        batch = docs.where(b == tick)
        verdict = incremental_exact_verdict(index, batch)
        kept_ids.extend(
            r.new_id for r in verdict.where("is_kept").collect()
        )
        index = index.unionByName(text_digests(batch))
    kept = docs.join(
        spark.createDataFrame([(i,) for i in kept_ids], "doc_id bigint"),
        "doc_id",
        "left_semi",
    )
    n_texts = docs.select("text").distinct().count()
    assert kept.count() == len(kept_ids) == n_texts
    assert kept.select("text").distinct().count() == n_texts


def test_compacted_index_preserves_verdicts(spark, tmp_path):
    """Per-tick appends leave many small files; compacting the band
    index must not change a later tick's candidate pairs."""
    from map_reduce_library_spark.operators.maintenance import (
        compact_parquet,
    )

    docs = _docs(spark)
    b = hash_bucket("doc_id", 4)
    index_dir = str(tmp_path / "index")
    for tick in range(3):
        lsh_bands(
            minhash_signature(shingles(docs.where(b == tick)))
        ).write.mode("append").parquet(index_dir)
    compacted_dir = str(tmp_path / "compacted")
    compact_parquet(spark, index_dir, compacted_dir)

    last = docs.where(b == 3)
    orig = _pairs_set(
        incremental_lsh_pairs(spark.read.parquet(index_dir), last)
    )
    comp = _pairs_set(
        incremental_lsh_pairs(spark.read.parquet(compacted_dir), last)
    )
    assert orig == comp and orig, "compaction changed the candidate set"


def test_exact_verdict_handles_null_text(spark):
    """NULL-text docs must not vanish from the verdict: they dedup
    against each other (null-safe digest joins), and match nothing
    with real text."""
    from map_reduce_library_spark.operators.dedup import (
        incremental_exact_verdict,
        text_digests,
    )

    existing = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id bigint, text string"
    )
    incoming = spark.createDataFrame(
        [(10, None), (11, None), (12, "hello"), (13, "fresh")],
        "doc_id bigint, text string",
    )
    v = {
        r.new_id: (r.dup_of_corpus, r.batch_rep, r.is_kept)
        for r in incremental_exact_verdict(
            text_digests(existing), incoming
        ).collect()
    }
    assert set(v) == {10, 11, 12, 13}, "a doc vanished from the verdict"
    assert v[10] == (2, 10, False)   # dup of corpus NULL-text doc 2
    assert v[11] == (2, 10, False)
    assert v[12] == (1, 12, False)   # dup of corpus 'hello'
    assert v[13] == (None, 13, True)


def test_incremental_cap_drops_viral_bucket_pairs(spark):
    """The ingest path's hot-bucket cap (code-review r6: the
    'production dedup shape' had no defense against a viral band_sig
    paying B×b probe rows every tick). Capped: buckets whose COMBINED
    index+batch membership exceeds the cap contribute no pairs;
    normal near-dup pairs still flow. Uncapped stays the full
    answer."""
    viral = "the same viral boilerplate text repeated everywhere always"
    near = "a perfectly normal document body with enough tokens to shingle"
    rows = []
    for i in range(30):  # index side: 30 viral docs + 2 near-dups
        rows.append((i, viral))
    rows += [(100, near), (101, near + " extra")]
    existing = spark.createDataFrame(rows, "doc_id bigint, text string")
    batch = spark.createDataFrame(
        [(200, viral), (201, viral), (202, near)],
        "doc_id bigint, text string",
    )
    index = lsh_bands(minhash_signature(shingles(existing)))

    uncapped = _pairs_set(incremental_lsh_pairs(index, batch))
    capped = _pairs_set(
        incremental_lsh_pairs(index, batch, max_bucket=8)
    )
    viral_ids = set(range(30)) | {200, 201}
    assert any(a in viral_ids and b in viral_ids for a, b in uncapped)
    assert not any(
        a in viral_ids and b in viral_ids for a, b in capped
    ), "viral-bucket pairs survived the cap"
    # the normal near-dup family is untouched by the cap
    normal_uncapped = {
        p for p in uncapped if p[0] not in viral_ids and p[1] not in viral_ids
    }
    normal_capped = {
        p for p in capped if p[0] not in viral_ids and p[1] not in viral_ids
    }
    assert normal_capped == normal_uncapped and normal_capped
    assert capped <= uncapped


def test_compaction_cadence_bounds_index_files_over_50_ticks(
    spark, tmp_path
):
    """VERDICT r6 item 5: per-tick appends grow the band/digest index
    file counts linearly with tick count; the in-place compaction
    cadence must bound them WITHOUT changing any reader-visible
    result. 50 one-at-a-time ticks (the exact scenario the verdict
    named), compacting every 10: immediately after each compaction
    the index is a handful of files (bytes-sized, tiny here), and the
    drained pipeline still converges to the batch answer — pairs
    equal full-corpus ``minhash_lsh_pairs``, exactly one kept verdict
    per distinct text, one verdict row per doc."""
    from map_reduce_library_spark.streaming.ingest_dedup import (
        compact_work_dir,
        dedup_verdict_table,
    )

    docs = _docs(spark)
    b = hash_bucket("doc_id", 50)
    work = tmp_path / "work"
    dirs = [
        str(work / d) for d in ("index", "pairs", "digests", "verdicts")
    ]

    from map_reduce_library_spark.operators.maintenance import (
        _list_data_files,
    )

    post_compact_counts: list[int] = []
    uncompacted_peak = 0
    for tick in range(50):
        ingest_batch(docs.where(b == tick), *dirs)
        uncompacted_peak = max(
            uncompacted_peak, len(_list_data_files(spark, dirs[0]))
        )
        if (tick + 1) % 10 == 0:
            counts = compact_work_dir(spark, str(work))
            post_compact_counts.append(counts["index"])
            assert counts["digests"] <= 4

    # Bounded: every post-compaction observation is a handful of
    # files regardless of how many ticks have accumulated, while the
    # append-only growth between compactions demonstrably exceeds it.
    assert post_compact_counts and max(post_compact_counts) <= 4
    assert uncompacted_peak > max(post_compact_counts), (
        "fixture too small to demonstrate file growth"
    )

    # Verdicts/pairs unchanged by compaction: batch-answer convergence.
    got = _pairs_set(dedup_pairs_table(spark, dirs[1]))
    assert got == _pairs_set(minhash_lsh_pairs(docs))
    v = dedup_verdict_table(spark, dirs[3])
    assert v.count() == docs.count()
    assert v.where("is_kept").count() == docs.select(
        "text"
    ).distinct().count()


def test_streaming_pipeline_compaction_cadence_preserves_convergence(
    spark, tmp_path
):
    """The cadence wiring through foreachBatch itself (the direct-call
    test above exercises compact_work_dir in isolation): drain 4 ticks
    with compact_every=2 — two in-stream compactions fire — and the
    pairs table still equals the batch answer with a bounded index
    file count."""
    from map_reduce_library_spark.operators.maintenance import (
        _list_data_files,
    )

    docs = _docs(spark)
    b = hash_bucket("doc_id", 4)
    chunks = tmp_path / "chunks"
    for tick in range(4):
        docs.where(b == tick).coalesce(1).write.mode("append").parquet(
            str(chunks)
        )
    work = tmp_path / "work"
    pairs_dir = run_incremental_dedup_ingest(
        spark, str(chunks), str(work), compact_every=2
    )
    assert _pairs_set(dedup_pairs_table(spark, pairs_dir)) == _pairs_set(
        minhash_lsh_pairs(docs)
    )
    # last compaction fired at tick 4 (batch_id 3); nothing appended
    # after it, so the index should be at its compacted floor
    assert len(_list_data_files(spark, str(work / "index"))) <= 4


def test_compact_index_crash_windows_never_lose_rows(spark, tmp_path):
    """The monotone-superset protocol, pinned state by state: a crash
    after the compacted parts move IN but before the old parts are
    deleted leaves duplicates, never losses — and the duplicate-
    idempotent readers (distinct pairs view) return identical results
    in every intermediate state."""
    import uuid as _uuid

    from map_reduce_library_spark.operators.maintenance import (
        _list_data_files,
        compact_parquet,
    )

    docs = _docs(spark)
    b = hash_bucket("doc_id", 4)
    index_dir = str(tmp_path / "index")
    for tick in range(3):
        lsh_bands(
            minhash_signature(shingles(docs.where(b == tick)))
        ).write.mode("append").parquet(index_dir)
    last = docs.where(b == 3)

    def probe():
        return _pairs_set(
            incremental_lsh_pairs(
                spark.read.schema(
                    "doc_id bigint, band_id int, band_sig string"
                ).parquet(index_dir),
                last,
            )
        )

    want = probe()
    assert want, "fixture produced no candidate pairs"

    # State A (mid-step-2 crash): compacted parts moved in, old parts
    # still present -> every row duplicated once.
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    old = _list_data_files(spark, index_dir)
    tmp = index_dir + "__compact_tmp"
    compact_parquet(spark, index_dir, tmp)
    salt = _uuid.uuid4().hex[:8]
    for i, part in enumerate(_list_data_files(spark, tmp)):
        fs.rename(
            part,
            jvm.org.apache.hadoop.fs.Path(
                jpath, f"compact-{salt}-{i:05d}-{part.getName()}"
            ),
        )
    n_rows_superset = spark.read.parquet(index_dir).count()
    assert probe() == want, "duplicated index changed the reader result"

    # State B (mid-step-3 crash): some old parts deleted.
    fs.delete(old[0], False)
    assert probe() == want

    # State C (protocol completed by the next pass): remaining old
    # parts deleted -> back to exactly the original row set.
    for part in old[1:]:
        fs.delete(part, False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    final_rows = spark.read.parquet(index_dir).count()
    assert final_rows * 2 == n_rows_superset
    assert probe() == want
