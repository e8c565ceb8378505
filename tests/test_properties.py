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


# ---- band-OR LSH / hot-bucket cap invariants ------------------------------

docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_capped_candidates_are_a_subset(spark, texts):
    """For ANY corpus and ANY cap, the capped candidate set must be a
    subset of the uncapped one (the cap only drops), and cap=len(df)
    must be the identity (buckets can never exceed the corpus)."""
    from map_reduce_library_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(df).collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(df, max_bucket=1).collect()
    }
    ident = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(df, max_bucket=len(texts)).collect()
    }
    assert capped <= full
    assert ident == full


def test_band_or_genuinely_widens_candidates(spark):
    """Band-OR must genuinely WIDEN candidates, not just contain its
    own tables (the old subset-only assertion held by construction and
    could not catch a band-OR regression — ADVICE r4). Falsifiable
    facts pinned on the sf0.001 embeddings: (a) the union is STRICTLY
    larger than every single table (measured: 8327 union vs
    1992-2280 per table), which fails if the tables collapse to one
    seed stream or the union degenerates to a single table; (b) every
    table contributes pairs no other table found, i.e. the per-table
    draws are genuinely independent."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.similarity import (
        banded_signatures,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sigs = banded_signatures(emb, 64).cache()

    def pairs(s):
        a = s.select(F.col("vec_id").alias("a"), "tbl", "sig")
        b = s.select(F.col("vec_id").alias("b"), "tbl", "sig")
        return {
            (r.a, r.b)
            for r in a.join(b, ["tbl", "sig"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .collect()
        }

    union_pairs = pairs(sigs)
    per_table = [pairs(sigs.where(F.col("tbl") == t)) for t in range(4)]
    sigs.unpersist()

    assert union_pairs == set().union(*per_table)
    for t, tp in enumerate(per_table):
        assert len(union_pairs) > len(tp), (
            f"union ({len(union_pairs)}) not strictly larger than "
            f"table {t} ({len(tp)}) - band-OR adds nothing"
        )
        others = set().union(*(p for u, p in enumerate(per_table) if u != t))
        assert tp - others, f"table {t} contributes no unique pairs"


# ---- connected components vs union-find ----------------------------------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    """The distributed min-label CC (propagate + pointer jumping +
    fused convergence probe) must agree with a sequential union-find
    on arbitrary random graphs — including shapes the corpus never
    produces (cycles, long chains, re-entrant edges)."""
    from map_reduce_library_spark.operators.dedup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    expected = {
        node: min(members)
        for members in comps.values()
        for node in members
    }

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(df).collect()
    }
    assert got == expected


# ---- SCD2 islands vs sequential reference --------------------------------

event_logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user_id
        st.sampled_from(["a", "b", "c"]),  # state
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=event_logs)
def test_scd2_matches_sequential_reference(spark, log):
    """The gaps-and-islands SCD2 build must produce exactly the
    intervals a sequential per-user scan produces: one interval per
    maximal run, valid_to = next run's valid_from, open tail."""
    import datetime as dt
    import os
    import tempfile

    from map_reduce_library_spark.querydefs.temporal import (
        scd2_user_state_history,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), user, state, 0.0, "{}")
        for i, (user, state) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    # Sequential reference: per-user ordered scan collapsing runs.
    expected = []
    per_user: dict[int, list] = {}
    for eid, ts, user, state, _v, _p in rows:
        per_user.setdefault(user, []).append((ts, eid, state))
    for user, evs in per_user.items():
        evs.sort()
        runs = []
        for ts, eid, state in evs:
            if runs and runs[-1]["state"] == state:
                runs[-1]["n"] += 1
            else:
                runs.append(
                    {"state": state, "from": ts, "first": eid, "n": 1}
                )
        for i, run in enumerate(runs):
            nxt = runs[i + 1]["from"] if i + 1 < len(runs) else None
            expected.append(
                (
                    user,
                    run["state"],
                    run["from"],
                    nxt,
                    run["first"],
                    run["n"],
                    nxt is None,
                )
            )

    got = [
        (
            r.user_id,
            r.state,
            r.valid_from,
            r.valid_to,
            r.first_event_id,
            r.n_events,
            r.is_current,
        )
        for r in scd2_user_state_history(spark, d).collect()
    ]
    # Plain tuple sort is safe: (user, state, valid_from) is unique
    # per interval, so comparison never reaches the None-able
    # valid_to position.
    assert sorted(got) == sorted(expected)
