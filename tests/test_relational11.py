"""Round-5 widening queries: Q6 shape, bigram LM counts, inverted
index, co-occurrence PMI, percent_rank/cume_dist."""

from __future__ import annotations

from conftest import SF_CORRECTNESS, assert_oracle_match

from map_reduce_library_spark.queries import QUERIES


def test_forecast_revenue_change_oracle(spark):
    assert_oracle_match(spark, "forecast_revenue_change")


def test_forecast_revenue_change_pushdown(spark):
    """Q6 is the pushdown benchmark: every predicate must reach the
    parquet scan (date range, discount band, quantity)."""
    plan = (
        QUERIES["forecast_revenue_change"](spark, SF_CORRECTNESS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters:" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for col in ("l_shipdate", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan: {pushed}"


def test_bigram_counts_oracle(spark):
    assert_oracle_match(spark, "bigram_counts")


def test_bigram_counts_consistency(spark):
    """Bigrams per doc = tokens - 1 (empty-token split semantics), so
    the total bigram mass must be sum(len(toks)) - n_docs; and the
    top-k must use TakeOrderedAndProject, not a global sort."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    expected = docs.select(
        F.sum(F.size(F.split("text", " ", -1)) - 1).alias("m")
    ).collect()[0].m
    # recompute without the limit to check the mass balance
    all_bigrams = docs.select(
        F.explode(
            F.expr(
                "zip_with(slice(split(text, ' ', -1), 1,"
                " greatest(size(split(text, ' ', -1)) - 1, 0)),"
                " slice(split(text, ' ', -1), 2,"
                " greatest(size(split(text, ' ', -1)) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram")
    )
    assert all_bigrams.count() == expected

    plan = (
        QUERIES["bigram_counts"](spark, SF_CORRECTNESS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_inverted_index_oracle(spark):
    assert_oracle_match(spark, "inverted_index_tokens")


def test_inverted_index_postings_sorted_and_capped(spark):
    """Postings are a comma-joined string (driver-hashable — a list
    column errors the driver canonicalizer, VERDICT r5); parsed back,
    they must be numerically sorted, capped at 20, unique."""
    rows = QUERIES["inverted_index_tokens"](spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        assert isinstance(r.postings, str)
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(set(ids)) == len(ids)
        assert len(ids) <= 20
        assert len(ids) == min(r.df, 20)


def test_token_cooccurrence_pmi_oracle(spark):
    assert_oracle_match(spark, "token_cooccurrence_pmi")


def test_pmi_pairs_canonical_and_bounded(spark):
    """Pairs are canonical (tok_a < tok_b) and bounded by V(V-1)/2;
    co-occurrence can never exceed either token's own df."""
    rows = QUERIES["token_cooccurrence_pmi"](spark, SF_CORRECTNESS).collect()
    assert 0 < len(rows) <= 30 * 29 // 2
    for r in rows:
        assert r.tok_a < r.tok_b


def test_cume_dist_oracle(spark):
    assert_oracle_match(spark, "cume_dist_doc_lengths")


def test_cume_dist_bounds(spark):
    """percent_rank in [0,1] with 0 for each partition's minimum;
    cume_dist in (0,1] with 1 for each partition's maximum."""
    rows = QUERIES["cume_dist_doc_lengths"](spark, SF_CORRECTNESS).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for members in by_source.values():
        assert min(r.pct_rank for r in members) == 0.0
        assert max(r.cume for r in members) == 1.0
        for r in members:
            assert 0.0 <= r.pct_rank <= 1.0
            assert 0.0 < r.cume <= 1.0


def _check_histogram_invariants(spark, name):
    """Buckets are contiguous (lo/hi ranges don't overlap), cover all
    rows, and are approximately equal-depth (within interpolation/
    sketch slack of n/10 each)."""
    from tests.conftest import SF_SMOKE

    rows = sorted(
        QUERIES[name](spark, SF_SMOKE).collect(),
        key=lambda r: r.bucket,
    )
    li_n = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    assert [r.bucket for r in rows] == list(range(10))
    assert sum(r.n_rows for r in rows) == li_n
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo, "bucket ranges overlap"
    target = li_n / 10
    for r in rows:
        assert 0.8 * target <= r.n_rows <= 1.2 * target, (
            r.bucket,
            r.n_rows,
            target,
        )


def test_equi_depth_histogram_invariants(spark):
    _check_histogram_invariants(spark, "equi_depth_price_histogram")


def test_equi_depth_histogram_exact_invariants(spark):
    _check_histogram_invariants(spark, "equi_depth_price_histogram_exact")


def test_equi_depth_histogram_exact_oracle(spark):
    assert_oracle_match(spark, "equi_depth_price_histogram_exact")


def test_equi_depth_headline_uses_sketch_not_holistic(spark):
    """The headline's edges must come from approx_percentile (KLL
    sketch, mergeable partials) — the exact percentile() buffers the
    whole column in ONE aggregation buffer and OOMs at 100 TB (the
    round-5 perf-weak). The exact variant is the sf0.01 oracle twin
    only."""
    plan = (
        QUERIES["equi_depth_price_histogram"](spark, SF_CORRECTNESS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "approx_percentile" in plan
    assert "percentile(" not in plan.replace("approx_percentile(", "")
