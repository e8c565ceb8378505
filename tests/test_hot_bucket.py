"""Hot-bucket cap for LSH candidate generation (round-3 verdict task
5): a synthetic viral bucket (one boilerplate band signature shared by
many docs) must be droppable — and audited — so candidate counts stay
bounded, while normal buckets are untouched. Also pins the hashed
shuffle key of exact_dedup (task 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    lsh_hot_buckets,
)

VIRAL_N = 100  # docs in the template-spam bucket
NORMAL = [  # three small organic buckets
    (1000, 0, "s-a"), (1001, 0, "s-a"),
    (2000, 1, "s-b"), (2001, 1, "s-b"), (2002, 1, "s-b"),
    (3000, 2, "s-c"),
]


def _band_df(spark):
    viral = [(i, 0, "viral-template") for i in range(VIRAL_N)]
    return spark.createDataFrame(
        viral + NORMAL, "doc_id long, band_id int, band_sig string"
    )


def test_uncapped_pairs_are_quadratic_in_the_hot_bucket(spark):
    n = lsh_candidate_pairs(_band_df(spark)).count()
    assert n == VIRAL_N * (VIRAL_N - 1) // 2 + 1 + 3


def test_cap_drops_only_the_hot_bucket(spark):
    capped = lsh_candidate_pairs(_band_df(spark), max_bucket=10)
    rows = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # all VIRAL_N² spam pairs gone; every organic pair intact
    assert rows == {(1000, 1001), (2000, 2001), (2000, 2002), (2001, 2002)}


def test_cap_at_exact_bucket_size_keeps_the_bucket(spark):
    df = _band_df(spark)
    n = lsh_candidate_pairs(df, max_bucket=VIRAL_N).count()
    assert n == VIRAL_N * (VIRAL_N - 1) // 2 + 1 + 3  # > cap, not >=


def test_hot_bucket_audit_relation(spark):
    hot = lsh_hot_buckets(_band_df(spark), 10).collect()
    assert len(hot) == 1
    assert (hot[0].band_sig, hot[0].n_members) == ("viral-template", VIRAL_N)


def test_exact_dedup_shuffles_hashed_keys(spark):
    """The exchange key must be the md5 digest, never the raw text
    (round-3 verdict task 6): at 100 TB the shuffle sorts/compares
    32-byte keys instead of whole documents."""
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc")], "doc_id long, text string"
    )
    out = exact_dedup(df)
    rows = {(r.text, r.doc_id, r.n_copies) for r in out.collect()}
    assert rows == {("aa bb", 1, 2), ("cc", 3, 1)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "md5(" in plan, plan
    exchange = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert exchange, "expected a hash exchange in the plan"
    # keys are the md5/length grouping expressions, never the raw text
    assert not any("text#" in ln for ln in exchange), exchange


def test_cap_observe_metric_counts_drops_inline(spark):
    """The capped path's Observation side output (VERDICT r4 item 7):
    metrics must arrive from the SAME job that computes the pairs —
    observed on the marked probe-side relation, since anything under
    the broadcast build side is AQE-pruned when empty — with the
    dropped-row count matching the audit relation's member sum."""
    from pyspark.sql import Observation

    obs = Observation("lsh_hot_buckets_drops")
    capped = lsh_candidate_pairs(
        _band_df(spark), max_bucket=10, observation=obs
    )
    n_pairs = capped.count()  # the one action; no separate audit pass
    assert n_pairs == 4
    assert obs.get == {
        "n_band_rows_dropped": VIRAL_N,
        "n_band_rows_total": VIRAL_N + len(NORMAL),
    }


def test_cap_observe_metric_zero_when_nothing_dropped(spark):
    """With the cap above every bucket size the metric must report
    zero drops — the case AQE's empty-relation propagation breaks if
    the observation sits on the (empty) build side."""
    from pyspark.sql import Observation

    obs = Observation("lsh_hot_buckets_nodrops")
    n = lsh_candidate_pairs(
        _band_df(spark), max_bucket=VIRAL_N, observation=obs
    ).count()
    assert n == VIRAL_N * (VIRAL_N - 1) // 2 + 1 + 3
    assert obs.get == {
        "n_band_rows_dropped": 0,
        "n_band_rows_total": VIRAL_N + len(NORMAL),
    }
