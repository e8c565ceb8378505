"""Corpus-wide plan-smell audit: every declared query's physical plan
must be free of the patterns that do not survive a 100x scale-up.

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: quadratic row
  pairing.  Only the deliberately-quadratic ground-truth variant
  (``ngram_jaccard_pairs``, excluded from the bench headline for the
  same reason) may contain one.
- ``BatchEvalPython``: row-at-a-time (pickle-per-row) Python UDF
  execution.  All Python on the hot path must go through Arrow
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``),
  a 10-100x serialization difference.
"""

from conftest import SF_CORRECTNESS

from map_reduce_library_spark.queries import QUERIES

# Ground-truth-only variants, quadratic by construction and excluded
# from the bench headline: exact all-pairs Jaccard (oracle for
# ngram_jaccard_lsh), blocked all-pairs cosine (oracle for
# embedding_cosine_dups_lsh, the bucketed production path), and the
# recall evaluation that embeds the quadratic exact side.
ALLOWED_QUADRATIC = {
    "ngram_jaccard_pairs",
    "embedding_cosine_dups",
    "emb_dedup_recall",
}

# Queries that attach a GLOBAL scalar (grand total, corpus size) to
# every row: Spark plans that as a BroadcastNestedLoopJoin whose build
# side is a single-row ungrouped aggregate — constant-size broadcast,
# linear work, the right plan at any scale.
ALLOWED_SCALAR_ATTACH = {
    "global_sales_opportunity",
    "important_part_value",
    "heavy_hitter_tokens",
    # single-row normalization constant (sum of p^alpha)
    "temperature_mix",
    # single-row corpus size (n_docs) attached to the PMI pairs
    "token_cooccurrence_pmi",
    # same single-row n_docs scalar attached to the idf expression
    # (r8 — replaced an eager plan-build-time count())
    "tfidf_top_terms",
    # one-row Bloom signature map broadcast against the probe scan
    "bloom_pruned_part_revenue",
    # single-row vocabulary-size constant attached to the NLL terms
    "bigram_perplexity_topk",
    # single-row avgdl (mean document length) attached to the scoring
    # join's candidate rows
    "bm25_topk_docs",
    # single-row (mean per-key load, total rows) moment relation
    # attached to the per-key count aggregate
    "join_key_skew_report",
    # one-row decile-boundary relation (approx_percentile sketch in
    # the headline, holistic percentile in the sf0.01 oracle twin)
    # attached to the price scan for the bucket fold
    "equi_depth_price_histogram",
    "equi_depth_price_histogram_exact",
    # one-row NOT-IN-list-size scalar for exact three-valued NOT IN
    # (empty exclusion list keeps NULL-key rows)
    "parts_supplier_relationship",
}

# Brute-force similarity baselines: a BOUNDED query-vector set (pushed
# `vec_id < k` filter) broadcast against the candidate corpus — work is
# (constant k) x candidates, i.e. linear in the big side.  The LSH/IVF
# variants are the unbounded-query scale path.
ALLOWED_BOUNDED_BROADCAST = {
    "cosine_topk",
    "ivf_ann_topk",
    # multi-probe variant: same bounded centroid broadcast (vec_id <
    # N_CENTROIDS pushed filter), queries just keep 2 probe rows
    "ivf_ann_multiprobe_topk",
    # fitted-codebook variant: the Lloyd fit and the assignment both
    # broadcast the ≤N_CENTROIDS-row centroid relation against the
    # corpus — constant-size build side, linear probe work
    "ivf_kmeans_topk",
    # embed cosine_topk as the exact side of their recall evaluations
    "ann_recall_at_k",
    "ivf_recall_at_k",
    "ivf_kmeans_recall_at_k",
    "ivf_pq_recall_at_k",
    "ivf_pq_rerank_recall_at_k",
    # embeds cosine_topk (single pushed query vector) as its semantic
    # ranker; the lexical side is BM25's audited term-filter plan
    "hybrid_rrf_topk",
    # persisted-index serve path (round 9): the only NLJ is the
    # QUERY-side coarse quantizer — the bounded query set (pushed
    # vec_id < N_QUERIES filter) crossed with the stored
    # ≤n_centroids-row centroid relation (broadcast). Corpus-side
    # candidate scoring goes through the cells/codes equi-joins; the
    # corpus itself never enters a nested loop. (The in-session
    # ivf_pq_topk hides the same shape inside its assignment
    # checkpoint — serving from parquet exposes it to the audit.)
    "ivf_pq_persisted_topk",
    "ivf_pq_incremental_topk",
    "ivf_pq_deleted_topk",
    "ivf_pq_filtered_topk",
}



# Queries whose plan carries an `Exchange SinglePartition` — reviewed
# individually: every one is the final merge of a PARTIAL aggregate
# (single/tiny-row global result) or a window/sort over an
# already-aggregated tiny relation, never a global sort/window over
# raw corpus rows. A NEW query landing here fails the audit until its
# single-partition stage is reviewed and added — that's the point:
# an unpartitioned window over raw data is the scale smell this pins.
ALLOWED_SINGLE_PARTITION = {
    "disjunctive_predicate_revenue",
    "emb_dedup_recall",
    # Q6 shape: final merge of the partial ungrouped aggregate
    # (single-row result), the same shape as the other revenue scalars
    "forecast_revenue_change",
    # final merge of the single-row n_docs corpus-size aggregate
    "token_cooccurrence_pmi",
    # same single-row n_docs merge (scalar-attach idf constant, r8)
    "tfidf_top_terms",
    "gap_fill_daily_revenue",
    "global_sales_opportunity",
    "heavy_hitter_tokens",
    "important_part_value",
    "promo_revenue_pct",
    "small_quantity_revenue",
    "source_lang_mix",
    "temperature_mix",
    "three_valued_in_semantics",
    # scalar max over the per-supplier aggregate (one row per
    # supplier), not corpus rows
    "top_supplier_revenue",
    # final merge assembling the one-row Bloom word map from the
    # per-word partial bit_or aggregate
    "bloom_pruned_part_revenue",
    # final merge of the single-row vocabulary-size aggregate
    "bigram_perplexity_topk",
    # final merge of the single-row avgdl aggregate
    "bm25_topk_docs",
    # unpartitioned window over the 3-row stage-count relation
    "funnel_view_click_purchase",
    # ordered running-sum window over the per-DAY aggregate (one row
    # per calendar day, bounded by the report range), not raw events
    "ewma_daily_revenue",
    # rank windows + fusion join over each ranker's bounded top-50
    # list (plus BM25's single-row avgdl merge), never corpus rows
    "hybrid_rrf_topk",
    # final merge of the single-row (mean, total) moment aggregate
    # over the per-key counts
    "join_key_skew_report",
    # final merge of the one-row decile-boundary quantile aggregate
    # (sketch headline / holistic oracle twin)
    "equi_depth_price_histogram",
    "equi_depth_price_histogram_exact",
    # final merge of the one-row NOT-IN-list-size aggregate
    "parts_supplier_relationship",
    # final merge of the one-row expectations aggregate (every rule is
    # a partial sum over the scan; the report itself is 6 rows)
    "data_quality_report",
}


def _build_is_scalar(plan: str) -> bool:
    return "keys=[]" in plan or "LocalTableScan" in plan


def _non_runtime_filter_single_partition(plan: str) -> bool:
    """True iff the plan has an `Exchange SinglePartition` that is NOT
    the final merge of a Spark-injected runtime Bloom filter.

    `InjectRuntimeFilter` adds `bloom_filter_agg` subqueries to prune
    one side of a shuffle join at scan time: a single-row partial/final
    aggregate whose merge is an `Exchange SinglePartition` over
    constant-size Bloom buffers. That exchange is the optimizer WORKING
    (less data enters the join), appears nondeterministically as stats
    cross the injection thresholds, and is never a global sort/window
    over raw rows — so it is exempted structurally rather than by
    query name: the line directly under the exchange is the
    `partial_bloom_filter_agg` that feeds it. A `ReusedExchange` LEAF
    line referencing such an exchange repeats the 'Exchange
    SinglePartition ...' text with no child underneath — the reuse of
    an already-exempted exchange is equally benign, so a
    ReusedExchange line is never an offender itself (its source
    exchange is still checked where it appears with its real
    child)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        if "ReusedExchange" in line:
            continue
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        if "partial_bloom_filter_agg" not in nxt:
            return True
    return False


def _build_is_bounded_broadcast(plan: str) -> bool:
    # broadcast build (never a shuffled nested loop) over a
    # filter-bounded scan of the query vectors (a `vec_id < k` query
    # set, or the single `vec_id = q` hybrid-retrieval query vector)
    return "IdentityBroadcastMode" in plan and (
        "LessThan(vec_id" in plan or "EqualTo(vec_id" in plan
    )


def test_corpus_wide_no_plan_smells(spark):
    offenders = {}
    for name, fn in QUERIES.items():
        plan = (
            fn(spark, SF_CORRECTNESS)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        smells = []
        if name not in ALLOWED_QUADRATIC:
            if "CartesianProduct" in plan:
                smells.append("CartesianProduct")
            if "BroadcastNestedLoopJoin" in plan:
                ok = (
                    (
                        name in ALLOWED_SCALAR_ATTACH
                        and _build_is_scalar(plan)
                    )
                    or (
                        name in ALLOWED_BOUNDED_BROADCAST
                        and _build_is_bounded_broadcast(plan)
                    )
                )
                if not ok:
                    smells.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            smells.append("BatchEvalPython(row-at-a-time)")
        if (
            _non_runtime_filter_single_partition(plan)
            and name not in ALLOWED_SINGLE_PARTITION
        ):
            smells.append("Exchange SinglePartition(unreviewed)")
        if smells:
            offenders[name] = smells
    assert not offenders, f"plan smells: {offenders}"
