"""Property-based tests (SURVEY.md §5): randomized group-sums against
pandas, and partition-count invariance of results."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from map_reduce_library_spark.core.mapreduce import run_map_reduce

kv_lists = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e", ""]),
        st.integers(min_value=-(10**9), max_value=10**9),
    ),
    min_size=0,
    max_size=200,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=kv_lists)
def test_group_sum_matches_pandas(spark, data):
    df = spark.createDataFrame(
        pd.DataFrame(data or [("a", 0)], columns=["k", "v"])
    )
    got = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    want = (
        pd.DataFrame(data or [("a", 0)], columns=["k", "v"])
        .groupby("k")["v"]
        .sum()
        .to_dict()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=kv_lists, nparts=st.sampled_from([1, 4, 32]))
def test_generic_mr_partition_invariance(spark, data, nparts):
    """run_map_reduce output is a set invariant to partitioning —
    the reference's output-bag semantics (order-insensitive)."""

    def m(_k, kv):
        yield kv

    def r(key, values):
        yield (key, sum(values))

    rows = [(None, kv) for kv in data]
    out = run_map_reduce(
        rows, m, r, spark=spark, num_partitions=nparts
    ).collect()
    want = {}
    for k, v in data:
        want[k] = want.get(k, 0) + v
    assert dict(out) == want
    assert len(out) == len(want)  # no duplicate keys emitted


def test_corpus_results_invariant_to_shuffle_partitions(spark):
    """Key queries must return identical results under different
    shuffle widths — catches accidental order/partition dependence."""
    from conftest import SF_SMOKE, rows_multiset

    from map_reduce_library_spark.queries import QUERIES

    names = ["pricing_summary", "minhash_lsh_pairs", "sessionize_events",
             "window_user_running", "session_window_native",
             "trailing_window_7d", "edit_distance_near_dups",
             "set_ops_bag_semantics"]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                df = QUERIES[n](spark, SF_SMOKE)
                ms = rows_multiset(df.columns, [tuple(r) for r in df.collect()])
                results.setdefault(n, []).append(ms)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for n, (a, b) in results.items():
        assert a == b, f"{n} changed under different shuffle partitioning"
