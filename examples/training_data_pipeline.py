#!/usr/bin/env python
"""End-to-end training-data pipeline: the composition this engine is
built for, over the synthetic corpus.

    raw documents
      → quality gate        (text_stats: length/diversity/stopwords)
      → perplexity gate     (bigram-LM NLL; drop the most surprising
                             tail, CCNet-style)
      → exact dedup         (md5 full-text, min-id representative)
      → near-dedup          (MinHash-LSH candidates → connected
                             components → keep cluster representative)
      → span-dedup gate     (content-defined chunks; drop docs whose
                             duplicated-span token mass exceeds 50% —
                             the CCNet duplicated-paragraph gate,
                             insertion-robust via CDC boundaries)
      → decontamination     (drop train docs sharing an 8-gram with
                             the held-out eval set)
      → class balancing     (cap every language at a stable
                             hash-picked N)
      → token accounting    (whitespace + BPE-ish counts)
      → deterministic split (train/val/test, hash-stable)
      → packed shards       (sequence packing into token budgets,
                             written partitioned by split)
      → tokenizer training  (BPE merge table learned on the train
                             shard only, written beside the shards)

Usage: python examples/training_data_pipeline.py OUT_DIR [SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_library_spark.operators.dedup import (  # noqa: E402
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)
from map_reduce_library_spark.operators.pipeline import (  # noqa: E402
    class_balanced_topn,
    decontamination_overlap,
    deterministic_split,
    observe_metrics,
    pack_sequences,
)
from map_reduce_library_spark.operators.bpe import bpe_learn  # noqa: E402
from map_reduce_library_spark.operators.cdc import (  # noqa: E402
    cdc_chunks,
    cdc_duplicate_chunks,
)
from map_reduce_library_spark.operators.lm import (  # noqa: E402
    bigram_nll_scores,
)
from map_reduce_library_spark.operators.text import (  # noqa: E402
    text_stats,
    token_accounting,
    unicode_normalize,
)
from map_reduce_library_spark.session import get_session  # noqa: E402
from map_reduce_library_spark.tables import load_table  # noqa: E402

QUALITY_MIN = 0.5
PPL_DROP_PCT = 0.98  # drop docs above the 98th avg-NLL percentile
PACK_BUDGET = 2048
EVAL_SET_MAX_ID = 50  # held-out eval docs: doc_id < 50
CLASS_CAP = 200


def _gate(df):
    """Materialize one gate's survivors (eager localCheckpoint) and
    return (survivors, count). Every gate boundary used to pay a
    count() that re-executed the ENTIRE upstream filter chain from
    the raw scan — O(stages²) total work across seven gates plus the
    final write/BPE/stats consumers (code-review r8). Checkpointing
    each gate makes every stage execute once; at corpus scale the
    same role is played by writing each gate's survivors to parquet
    (or deriving stage counts from observe() metrics in-line)."""
    out = df.localCheckpoint()
    return out, out.count()


def run_pipeline(spark, sf_dir: str, out_dir: str) -> dict:
    # 0. ingest canonicalization: NFC-normalize text ONCE, up front,
    # so every downstream fingerprint (exact md5, MinHash shingles,
    # CDC chunk hashes, 8-gram decontamination) sees canonical bytes —
    # composed vs decomposed spellings of the same doc would otherwise
    # slip every dedup gate. Once per document, before any fan-out.
    docs = unicode_normalize(load_table(spark, sf_dir, "documents"))

    # 1. quality gate — input size, pass count, and mean quality are
    # observed DURING the gate's own action (no extra scans)
    stats, gate_obs = observe_metrics(
        text_stats(docs),
        "quality_gate",
        {
            "rows": F.count(F.lit(1)),
            "passed": F.sum(
                (F.col("quality_score") >= QUALITY_MIN).cast("long")
            ),
            "mean_quality": F.avg("quality_score"),
        },
    )
    good, n_good = _gate(
        docs.join(
            stats.where(
                F.col("quality_score") >= QUALITY_MIN
            ).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    gate = gate_obs.get  # filled by the count() action above
    n_raw = int(gate["rows"])

    # 2. perplexity gate: fit the bigram LM on the surviving corpus,
    # drop the high-NLL tail (exact percentile over the per-doc score
    # relation — one small holistic agg; unscored single-token docs
    # pass through). The threshold comes from the data, so re-runs on
    # the same corpus are deterministic.
    scores = bigram_nll_scores(good)
    cut = scores.agg(
        F.percentile("avg_nll", F.lit(PPL_DROP_PCT)).alias("cut")
    )
    surprising = (
        scores.crossJoin(F.broadcast(cut))
        .where(F.col("avg_nll") > F.col("cut"))
        .select("doc_id")
    )
    good, n_ppl = _gate(good.join(surprising, "doc_id", "left_anti"))

    # 3. exact dedup (keep min-id representative)
    reps = exact_dedup(good).select(F.col("doc_id"))
    good, n_exact = _gate(good.join(reps, "doc_id", "left_semi"))

    # 4. near-dedup: LSH pairs → clusters → drop non-representatives
    clusters = connected_components(minhash_lsh_pairs(good))
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    good, n_near = _gate(good.join(drop, "doc_id", "left_anti"))

    # 4b. span-dedup gate: token mass inside content-defined chunks
    # whose text repeats across >= 2 surviving docs, per doc; drop
    # docs more than half made of duplicated spans (boilerplate /
    # templated bodies that survive doc-level dedup because the rest
    # of the doc differs)
    from map_reduce_library_spark.operators.text import doc_token_arrays

    # chunk ONCE and checkpoint: the hash relation feeds three
    # consumers (dup-hash mining, total mass, duplicated mass) — the
    # repo's one-write-many-reads discipline (shared_doc_tokens);
    # without it the fold plus the whole upstream filter chain would
    # re-execute per consumer
    ch = (
        cdc_chunks(doc_token_arrays(good))
        .withColumn("chunk_hash", F.md5("chunk_text"))
        .drop("chunk_text")
        .localCheckpoint()
    )
    dup_hashes = cdc_duplicate_chunks(chunks=ch).select("chunk_hash")
    mass = ch.groupBy("doc_id").agg(F.sum("n_tokens").alias("tot"))
    dup_mass = (
        ch.join(dup_hashes, "chunk_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("dup_tok"))
    )
    spammy = (
        mass.join(dup_mass, "doc_id")
        .where(F.col("dup_tok") * 2 > F.col("tot"))
        .select("doc_id")
    )
    good, n_span = _gate(good.join(spammy, "doc_id", "left_anti"))

    # 5. decontamination: the eval set is held out entirely, and any
    # surviving train doc sharing a word 8-gram with it is dropped
    eval_docs = good.where(F.col("doc_id") < EVAL_SET_MAX_ID)
    train_docs = good.where(F.col("doc_id") >= EVAL_SET_MAX_ID)
    tainted = (
        decontamination_overlap(train_docs, eval_docs)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
    )
    good, n_decon = _gate(
        train_docs.join(tainted, "doc_id", "left_anti")
    )

    # 6. class balancing: cap every language at a stable hash-picked N
    good, n_balanced = _gate(class_balanced_topn(good, "lang", CLASS_CAP))

    # 7. token accounting + 8. split + 9. packing
    toks = token_accounting(good).select("doc_id", "ws_tokens")
    ready = (
        good.join(toks, "doc_id")
        .transform(deterministic_split)
    )
    packed = pack_sequences(
        ready, "ws_tokens", PACK_BUDGET, order_col="doc_id", group_col="split"
    )

    # write shards partitioned by split (partition pruning on read)
    packed.select("doc_id", "text", "lang", "split", "seq_bin").write.mode(
        "overwrite"
    ).partitionBy("split").parquet(out_dir)

    # 10. tokenizer training: learn the BPE merge table on the TRAIN
    # shard only (the tokenizer must never see val/test), written next
    # to the shards — the artifact a trainer loads alongside the data.
    merges = bpe_learn(packed.where(F.col("split") == "train"))
    merges.write.mode("overwrite").parquet(f"{out_dir}_bpe_merges")
    # bpe_learn documents an EMPTY result (empty train shard, or all
    # surviving words single-character) — report "no merges" instead
    # of IndexError-ing after every shard was already written
    # (code-review r8).
    head = merges.orderBy("step").limit(1).collect()
    first_merge = head[0] if head else None

    shard_stats = {
        (r.split, r.seq_bin): r.n
        for r in packed.groupBy("split", "seq_bin").count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    return {
        "raw": n_raw,
        "mean_quality": round(float(gate["mean_quality"]), 4),
        "after_quality": n_good,
        "after_perplexity": n_ppl,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_near,
        "after_span_dedup": n_span,
        "after_decontamination": n_decon,
        "after_class_balance": n_balanced,
        "n_shards": len(shard_stats),
        "bpe_first_merge": (
            f"{first_merge.left_sym}+{first_merge.right_sym}"
            if first_merge is not None
            else None
        ),
    }


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_session(app_name="training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    counts = run_pipeline(spark, sf_dir, out_dir)
    for k, v in counts.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
