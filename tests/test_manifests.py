"""Manifest / corpus-audit queries (querydefs/manifests.py): oracle
differentials plus the semantic invariants the oracle can't state."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from map_reduce_library_spark.queries import QUERIES
from tests.conftest import SF_SMOKE, assert_oracle_match

NEW_QUERIES = [
    "dedup_manifest_diff",
    "manifest_checksum_by_source",
    "duplicate_multiplicity_histogram",
    "lateral_topk_orders_per_customer",
    "map_in_arrow_stats",
    "quality_tertile_mix",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_match(spark, name):
    assert_oracle_match(spark, name)


def test_manifest_diff_partitions_current_manifest(spark):
    """kept + added == today's full manifest size, and the fixture's
    statuses are a subset of the lattice. The sf testdata has no
    exact-duplicate texts below sf0.1, so 'removed' (a group's
    representative changing because its min-id doc arrived late)
    cannot occur here — the synthetic test below covers it."""
    from map_reduce_library_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    diff = QUERIES["dedup_manifest_diff"](spark, SF_SMOKE)
    by_status = {
        r.status: r.n
        for r in diff.groupBy("status").agg(F.sum("n").alias("n")).collect()
    }
    curr_size = exact_dedup(docs).count()
    assert by_status.get("kept", 0) + by_status.get("added", 0) == curr_size
    assert set(by_status) <= {"kept", "added", "removed"}
    assert by_status.get("added", 0) > 0 and by_status.get("kept", 0) > 0


def test_manifest_diff_lattice_on_duplicate_groups(spark):
    """Full kept/added/removed lattice on a corpus with real
    duplicate groups, mirroring the querydef's composition (prev =
    explicit id slice standing in for the hash slice):
      * text 'a': docs 1,2 — rep 1 in both runs -> kept
      * text 'b': docs 10(new),11 — rep was 11, becomes 10 ->
        removed(11) + added(10)
      * text 'c': doc 20 only in the new run -> added
    """
    from map_reduce_library_spark.operators.dedup import exact_dedup

    curr = spark.createDataFrame(
        [
            (1, "a", "s1"),
            (2, "a", "s1"),
            (10, "b", "s1"),
            (11, "b", "s1"),
            (20, "c", "s2"),
        ],
        "doc_id bigint, text string, source string",
    )
    prev = curr.where(F.col("doc_id").isin(1, 2, 11))
    a = exact_dedup(prev).select(F.col("doc_id").alias("id_a"))
    b = exact_dedup(curr).select(F.col("doc_id").alias("id_b"))
    diff = a.join(b, a.id_a == b.id_b, "full_outer").select(
        F.coalesce("id_a", "id_b").alias("doc_id"),
        F.when(F.col("id_a").isNull(), F.lit("added"))
        .when(F.col("id_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )
    got = {(r.doc_id, r.status) for r in diff.collect()}
    assert got == {
        (1, "kept"),
        (11, "removed"),
        (10, "added"),
        (20, "added"),
    }


def test_checksum_detects_single_row_change(spark):
    """Flipping one document's text flips that source's checksum and
    ONLY that source's checksum — the property that makes the
    per-source digest a safe cheap first-pass comparison."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    def checksums(df):
        from map_reduce_library_spark.operators.hashing import (
            md5_prefix60,
        )

        row_hash = md5_prefix60(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.coalesce(F.col("text"), F.lit("")),
            )
        )
        return {
            r.source: r.checksum
            for r in df.groupBy("source")
            .agg(F.bit_xor(row_hash).alias("checksum"))
            .collect()
        }

    base = checksums(docs)
    victim = docs.orderBy("doc_id").select("doc_id", "source").first()
    mutated = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim.doc_id, F.lit("!corrupted!")
        ).otherwise(F.col("text")),
    )
    after = checksums(mutated)
    assert after[victim.source] != base[victim.source]
    for src in base:
        if src != victim.source:
            assert after[src] == base[src]


def test_multiplicity_histogram_accounts_for_every_doc(spark):
    """sum over the histogram of n_copies * n_texts == corpus size
    (nothing lost, nothing double-counted). The sf0.1 table is the
    smallest with real duplicates (8 duplicate docs); smoke-sf has
    none, so the cluster-structure assertion runs on synthetic."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    hist = {
        r.n_copies: (r.n_texts, r.n_docs)
        for r in QUERIES["duplicate_multiplicity_histogram"](
            spark, SF_SMOKE
        ).collect()
    }
    assert sum(k * t for k, (t, _) in hist.items()) == docs.count()
    assert all(d == k * t for k, (t, d) in hist.items())

    from map_reduce_library_spark.operators.dedup import exact_dedup

    synth = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(
            ["a", "a", "a", "b", "b", "c", "d"]
        )],
        "doc_id bigint, text string, source string",
    )
    sh = {
        r.n_copies: (r.n_texts, r.n_docs)
        for r in exact_dedup(synth)
        .groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_texts"),
            F.sum("n_copies").alias("n_docs"),
        )
        .collect()
    }
    assert sh == {3: (1, 3), 2: (1, 2), 1: (2, 2)}


def test_lateral_topk_matches_window_formulation(spark):
    """The LATERAL phrasing and the window row_number phrasing are
    the same query; Catalyst should (and does) give both the
    WindowGroupLimit plan. Pin result equivalence."""
    lat = {
        tuple(r)
        for r in QUERIES["lateral_topk_orders_per_customer"](
            spark, SF_SMOKE
        ).collect()
    }
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    win = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )
    assert lat == {tuple(r) for r in win.collect()}


def test_lateral_plan_has_no_nested_loop(spark):
    plan = QUERIES["lateral_topk_orders_per_customer"](
        spark, SF_SMOKE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan, (
        "lateral LIMIT was not decorrelated into a group-limit plan"
    )


def test_map_in_arrow_counts_multibyte_correctly(spark):
    """bytes vs codepoints diverge on non-ASCII; nulls propagate."""
    df = spark.createDataFrame(
        [(1, "héllo wörld"), (2, None), (3, ""), (4, "a  b")],
        "doc_id bigint, text string",
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_chars_utf", "n_spaces"],
            )

    out = {
        r.doc_id: (r.n_bytes, r.n_chars_utf, r.n_spaces)
        for r in df.mapInArrow(
            stats,
            "doc_id bigint, n_bytes bigint, n_chars_utf bigint, "
            "n_spaces bigint",
        ).collect()
    }
    assert out[1] == (13, 11, 1)  # é and ö are 2 bytes each
    assert out[2] == (None, None, None)
    assert out[3] == (0, 0, 0)
    assert out[4] == (4, 4, 2)


def test_quality_tertiles_are_ordered_and_balanced(spark):
    """Within each lang: head avg >= middle avg >= tail avg, and
    bucket sizes differ by at most 1 (ntile contract)."""
    rows = QUERIES["quality_tertile_mix"](spark, SF_SMOKE).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = (r.n_docs, r.avg_chars)
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}
        h, m, t = (buckets[b] for b in ("head", "middle", "tail"))
        assert h[1] >= m[1] >= t[1], f"{lang}: tertiles out of order"
        sizes = sorted((h[0], m[0], t[0]))
        assert sizes[-1] - sizes[0] <= 1, f"{lang}: ntile imbalance"
