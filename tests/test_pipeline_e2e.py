"""Capstone integration: the full training-data pipeline example."""

import sys
from pathlib import Path

from conftest import SF_CORRECTNESS

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


def test_training_data_pipeline(spark, tmp_path):
    from training_data_pipeline import run_pipeline

    out = str(tmp_path / "shards")
    counts = run_pipeline(spark, SF_CORRECTNESS, out)

    assert counts["raw"] == 500
    # quality gate drops something but not most
    assert 400 <= counts["after_quality"] <= counts["raw"]
    # perplexity gate trims the high-NLL tail (~2% of scored docs),
    # never more than the configured tail share of the corpus
    assert (
        counts["after_quality"] * 0.95
        <= counts["after_perplexity"]
        < counts["after_quality"]
    )
    # exact dedup: corpus has no full-text dups
    assert counts["after_exact_dedup"] == counts["after_perplexity"]
    # near-dedup must collapse the planted clusters (25 pairs → >= 20
    # removed non-representatives)
    removed = counts["after_exact_dedup"] - counts["after_near_dedup"]
    assert removed >= 20, counts
    # span-dedup gate: monotone, and with doc-level near-dedup already
    # done it should drop at most a few spammy outliers
    assert (
        counts["after_near_dedup"] - 10
        <= counts["after_span_dedup"]
        <= counts["after_near_dedup"]
    )
    # decontamination holds out eval docs (id < 50) and drops tainted
    # train docs; class balancing can only shrink further
    assert counts["after_decontamination"] <= counts["after_span_dedup"] - 40
    assert counts["after_class_balance"] <= counts["after_decontamination"]
    assert counts["n_shards"] >= 3

    # output is partition-pruned readable and covers all splits
    back = spark.read.parquet(out)
    splits = {r.split for r in back.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    assert back.count() == counts["after_class_balance"]
    # no eval doc may reach the training shards
    assert back.where("doc_id < 50").count() == 0
    # no surviving train doc shares an 8-gram with the eval set
    from map_reduce_library_spark.operators.pipeline import (
        decontamination_overlap,
    )
    from map_reduce_library_spark.tables import load_table

    eval_docs = load_table(spark, SF_CORRECTNESS, "documents").where(
        "doc_id < 50"
    )
    leaks = decontamination_overlap(
        back.select("doc_id", "text"), eval_docs
    ).count()
    assert leaks == 0, "contaminated docs survived decontamination"
    # every kept doc is its own cluster representative: no two kept
    # docs should be near-dup pairs of each other
    from map_reduce_library_spark.operators.dedup import minhash_lsh_pairs

    kept_pairs = minhash_lsh_pairs(back.select("doc_id", "text")).count()
    assert kept_pairs == 0, "near-dup pairs survived dedup"

    # the tokenizer artifact: a full merge table learned on the train
    # shard only, usable by bpe_segment (step order intact)
    merges = spark.read.parquet(f"{out}_bpe_merges")
    from map_reduce_library_spark.operators.bpe import BPE_MERGES

    rows = merges.orderBy("step").collect()
    assert [r.step for r in rows] == list(range(1, BPE_MERGES + 1))
    assert all(r.pair_count > 0 for r in rows)
    assert counts["bpe_first_merge"] == f"{rows[0].left_sym}+{rows[0].right_sym}"
