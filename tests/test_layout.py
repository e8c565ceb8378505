"""Z-order layout (operators/layout.py): Morton-code correctness and
MEASURED file pruning vs a single-key sort, via real parquet footers."""

import pytest

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.layout import (
    parquet_overlap_fraction,
    write_zordered,
    zorder_key,
    _quantize,
)

from conftest import SF_CORRECTNESS as SF

N_FILES = 32


def test_morton_code_matches_python_reference(spark):
    """zorder_key's JVM shift/mask tree against a pure-Python bit
    interleave over an exhaustive small grid."""
    bits = 4
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a",
            "b",
            zorder_key([F.col("a"), F.col("b")], bits).alias("z"),
        ).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for a, b in rows:
        assert got[(a, b)] == ref(a, b), (a, b)
    # the curve is a bijection on the grid
    assert len(set(got.values())) == len(rows)


def test_quantize_edges(spark):
    df = spark.createDataFrame(
        [(None,), (-5,), (0,), (5,)], "x bigint"
    )
    q = df.select(
        _quantize(F.col("x"), F.lit(-5), F.lit(5), 4).alias("q")
    ).collect()
    vals = [r.q for r in q]
    assert vals[0] == 0  # NULL -> 0
    assert vals[1] == 0 and vals[3] == 15  # bounds hit the code range
    assert 0 <= vals[2] <= 15
    # constant column (hi == lo) degenerates to 0, not a divide error
    const = df.select(
        _quantize(F.col("x"), F.lit(7), F.lit(7), 4).alias("q")
    ).collect()
    assert all(r.q == 0 for r in const)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    sorted_dir = str(base / "sorted_by_orderkey")
    z_dir = str(base / "zordered")
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(sorted_dir)
    )
    write_zordered(li, z_dir, ["l_orderkey", "l_partkey"], N_FILES)
    return li, sorted_dir, z_dir


def test_zorder_preserves_rows(spark, layouts):
    li, _, z_dir = layouts
    back = spark.read.parquet(z_dir)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    # exact multiset round-trip
    key = [F.col(c).cast("string") for c in sorted(back.columns)]
    h = lambda d: d.select(  # noqa: E731
        F.md5(F.concat_ws("|", *key)).alias("h")
    ).groupBy("h").count()
    assert h(back).exceptAll(h(li)).isEmpty()


def test_zorder_prunes_secondary_column(spark, layouts):
    """The point of the operator: a selective l_partkey range must
    touch (measurably) fewer files under z-order than under the
    orderkey sort, where every file spans the whole partkey domain —
    checked against the REAL written footers."""
    li, sorted_dir, z_dir = layouts
    hi_key = li.agg(F.max("l_partkey")).collect()[0][0]
    lo, hi = 1, max(1, hi_key // 10)  # ~10% range on the 2nd dim
    frac_sorted = parquet_overlap_fraction(sorted_dir, "l_partkey", lo, hi)
    frac_z = parquet_overlap_fraction(z_dir, "l_partkey", lo, hi)
    assert frac_sorted >= 0.9  # foreign sort: essentially no pruning
    assert frac_z <= 0.6, (frac_z, frac_sorted)  # rectangles prune
    # and the primary column still prunes under z-order
    hi_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    frac_z_primary = parquet_overlap_fraction(
        z_dir, "l_orderkey", 1, max(1, hi_ok // 10)
    )
    assert frac_z_primary <= 0.6, frac_z_primary


def test_compact_parquet_zorder_reclusters(spark, layouts, tmp_path):
    """compact_parquet(zorder_cols=...) restores clustering on a
    time-ordered landing zone: same rows, pruned footers."""
    from map_reduce_library_spark.operators.maintenance import (
        compact_parquet,
    )

    li, sorted_dir, _ = layouts
    dst = str(tmp_path / "compacted_z")
    out = compact_parquet(
        spark,
        sorted_dir,
        dst,
        target_file_bytes=64 * 1024,  # force a multi-file output
        zorder_cols=["l_orderkey", "l_partkey"],
    )
    assert out.count() == li.count()
    hi = li.agg(F.max("l_partkey")).collect()[0][0]
    frac = parquet_overlap_fraction(dst, "l_partkey", 1, max(1, hi // 10))
    assert frac <= 0.6, frac


def test_zorder_bounds_worst_case_across_query_dimensions(spark, tmp_path):
    """A 1-D sort is perfect for predicates on its leading column and
    degenerate (touches every file) for the other dimension; Z-order
    keeps BOTH strip queries bounded. Actual-scan file counting via
    input_file_name (complementing the footer-stat fraction above).
    Migrated from the superseded maintenance.cluster_by_zorder test
    (r8 consolidation)."""
    n, files, side = 1 << 14, 16, 1 << 7
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    ypath = str(tmp_path / "lin_y")
    write_zordered(df, zpath, ["x", "y"], files)
    df.repartitionByRange(files, "y").sortWithinPartitions("y").write.mode(
        "overwrite"
    ).parquet(ypath)

    def touched(path, cond):
        return (
            spark.read.parquet(path)
            .where(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    x_strip, y_strip = F.col("x") < 8, F.col("y") < 8
    # y-sorted layout: perfect on y, degenerate on x
    assert touched(ypath, y_strip) <= 2
    assert touched(ypath, x_strip) == files
    # z-order: bounded on BOTH dimensions
    assert touched(zpath, x_strip) <= files // 2
    assert touched(zpath, y_strip) <= files // 2
    # and near-perfect on an aligned 2-D box
    assert touched(zpath, (F.col("x") < 16) & (F.col("y") < 16)) <= 2
    # correctness: clustering is a pure re-layout
    assert spark.read.parquet(zpath).count() == n


def test_quantize_survives_wide_range_keys(spark, tmp_path):
    """64-bit hash-surrogate keys whose min/max straddle most of the
    signed range: a raw long (hi - lo) would overflow and collapse
    every code to 0 (code-review r8 session 2); the double-space span
    must keep distinct codes and a usable layout."""
    lo, hi = -(1 << 62), (1 << 62)
    df = spark.createDataFrame(
        [(lo, 1), (-1000, 2), (0, 3), (1000, 4), (hi, 5)],
        "k bigint, v bigint",
    )
    q = df.select(
        _quantize(F.col("k"), F.lit(lo), F.lit(hi), 8).alias("q")
    ).collect()
    vals = [r.q for r in q]
    assert vals[0] == 0 and vals[-1] == 255
    assert len(set(vals)) >= 2, vals  # not collapsed
    assert vals == sorted(vals)  # order preserved
    # end-to-end: the write still produces a multi-code layout
    dst = str(tmp_path / "wide")
    write_zordered(df, dst, ["k", "v"], 2)
    back = spark.read.parquet(dst)
    assert back.count() == df.count()


def test_zorder_on_timestamp_key(spark, tmp_path):
    """(ts, user_id) — the landing-zone layout pair — clusters and
    prunes on both dimensions."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    dst = str(tmp_path / "ev_z")
    write_zordered(ev, dst, ["ts", "user_id"], 16)
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    hi_u = ev.agg(F.max("user_id")).collect()[0][0]
    frac_u = parquet_overlap_fraction(dst, "user_id", 1, max(1, hi_u // 10))
    assert frac_u <= 0.7, frac_u


def test_write_zordered_validates_eagerly(spark, layouts):
    li, _, _ = layouts
    with pytest.raises(ValueError, match="2-4 columns"):
        write_zordered(li, "/tmp/x", ["l_orderkey"], 4)
    with pytest.raises(ValueError, match="no column"):
        write_zordered(li, "/tmp/x", ["l_orderkey", "nope"], 4)
    with pytest.raises(ValueError, match="n_files"):
        write_zordered(li, "/tmp/x", ["l_orderkey", "l_partkey"], 0)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        write_zordered(ev, "/tmp/x", ["ts", "event_type"], 4)
