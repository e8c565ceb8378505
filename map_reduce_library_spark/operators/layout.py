"""Data-layout operators: Z-order (Morton) clustering for write-time
file organization.

Parquet readers prune whole files (and row groups) whose min/max
column statistics cannot satisfy a predicate. A table sorted by one
key prunes perfectly on that key and not at all on any other: every
file's min/max for the second column spans the whole domain. Z-order
interleaves the bits of several quantized key columns into one Morton
code and lays files out along that curve, so each file covers a small
RECTANGLE of the key space — a selective predicate on ANY of the
clustered columns overlaps only the files whose rectangle intersects
it (~N^((d-1)/d) of N files for a point/range query over one of d
dimensions, vs all N under a foreign sort).

This extends the reference's output stage (SURVEY.md §2D sinks —
ABSENT in reference: its client writes one driver-side text file,
FileWordCounter.cpp) with the layout decision every 100-TB ingest has
to make before anyone queries the data.

Scale notes:
- The z-value is pure JVM bit arithmetic (shiftright/shiftleft/&/|
  folded into whole-stage codegen) over per-column linear
  quantization; no Python anywhere.
- ``write_zordered`` range-partitions on the z-value (sampled range
  boundaries — one Spark-internal sampling pass, the same mechanism
  as any global sort) then sorts WITHIN partitions: total one wide
  exchange, the unavoidable cost of any clustered rewrite.
- Column min/max for quantization ride one small aggregate; the
  collect is a write-side action by design (writing IS an action) —
  this is an ingest/compaction-time operator, never a query-path one.
- Statistics-based pruning is measured, not assumed:
  ``parquet_overlap_fraction`` reads the written footers and reports
  the fraction of files a range predicate must touch
  (tests/test_layout.py pins z-order < single-key sort on the
  second dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZORDER_DEFAULT_BITS = 16


def _quantize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear quantization of a numeric column into [0, 2^bits):
    floor((x - lo) / (hi - lo) * (2^bits - 1)), clamped; NULL and the
    degenerate constant-column case (hi == lo) map to 0."""
    n_codes = float((1 << bits) - 1)
    # cast BEFORE subtracting: a raw long (hi - lo) overflows for
    # wide-range keys (e.g. a 64-bit hash surrogate whose min/max
    # straddle most of the signed range) — ANSI mode throws, non-ANSI
    # wraps negative and the span guard would silently collapse the
    # whole column to code 0 (code-review r8 session 2)
    span = hi.cast("double") - lo.cast("double")
    scaled = F.floor(
        (c.cast("double") - lo.cast("double")) / span * F.lit(n_codes)
    )
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1))
    return (
        F.when(c.isNull() | (span <= F.lit(0.0)), F.lit(0))
        .otherwise(clamped)
        .cast("bigint")
    )


def _as_numeric(df: DataFrame, col: str) -> Column:
    """Column as a quantizable numeric expression. Time is the
    commonest landing-zone layout key, so timestamps map to epoch
    micros and dates to epoch days (both order-preserving, both
    JVM-side); numerics pass through; anything else (strings, arrays)
    is refused eagerly — hash a string key to a numeric surrogate
    yourself if its ordering genuinely matters to your scans."""
    dt = df.schema[col].dataType.typeName()
    c = F.col(col)
    if dt in ("timestamp", "timestamp_ntz"):
        # unix_micros needs TimestampType; the NTZ cast interprets
        # wall-clock values in the SESSION timezone, so it is only
        # order-preserving under a fixed-offset zone (this repo pins
        # sessions to UTC) — under a DST zone, spring-forward-gap
        # values invert and fall-back values collapse, degrading (not
        # breaking) clustering near transitions
        return F.unix_micros(c.cast("timestamp"))
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01"))
    if dt in (
        "byte",
        "short",
        "integer",
        "long",
        "float",
        "double",
        "decimal",
    ) or dt.startswith("decimal"):
        return c
    raise ValueError(
        f"z-order column {col!r} has non-orderable-numeric type {dt}"
    )


def zorder_key(quantized: list[Column], bits: int) -> Column:
    """Interleave the bits of pre-quantized [0, 2^bits) codes into one
    Morton code: output bit (b * d + i) is bit b of column i. Pure
    shift/mask expression tree — 2 * bits * d JVM ops, codegen-fused."""
    d = len(quantized)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i))
    return z


def zorder_bounds_aggs(df: DataFrame, cols: list[str]) -> list[Column]:
    """The min/max aggregate expressions ``zorder_arrange`` needs for
    its quantization bounds, aliased ``__lo_<col>``/``__hi_<col>`` —
    exposed so a caller already running an aggregate over the same
    input (``compact_parquet``'s dedup-ratio pass) can fold the
    bounds in and hand the result Row to ``zorder_arrange(bounds=)``
    instead of paying a second scan. Validates the column types
    eagerly (same rules as the arrange itself)."""
    exprs = [_as_numeric(df, c) for c in cols]
    aggs: list[Column] = []
    for c, e in zip(cols, exprs):
        aggs += [F.min(e).alias(f"__lo_{c}"), F.max(e).alias(f"__hi_{c}")]
    return aggs


def zorder_arrange(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_DEFAULT_BITS,
    bounds=None,
) -> DataFrame:
    """Arrange ``df`` into ``n_files`` partitions clustered along the
    Z-order curve of ``cols`` (2-4 numeric columns), ready to write —
    the shared core of ``write_zordered`` and
    ``compact_parquet(zorder_cols=...)``.

    Per-column quantization bounds come from one min/max aggregate
    over the input (a write-side action — acceptable here and only
    here; query-path operators attach scalars lazily), or from
    ``bounds``: any row/mapping indexable by the
    ``zorder_bounds_aggs`` alias names, letting a caller fold the
    bounds into an aggregate it already runs. Bounds from a SUPERSET
    of the rows (e.g. pre-dedup) are valid — a wider range only
    coarsens quantization, never misorders it. Bits per column are
    capped so the interleaved code stays inside a signed 64-bit
    long."""
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"z-order wants 2-4 columns, got {cols}")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"no column(s) {missing} in {df.columns}")
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1: {n_files}")
    if "__zv" in df.columns:
        raise ValueError("input already carries a __zv column")
    d = len(cols)
    bits = min(bits, 62 // d)
    exprs = [_as_numeric(df, c) for c in cols]
    if bounds is None:
        bounds = df.agg(*zorder_bounds_aggs(df, cols)).collect()[0]
    qs = [
        _quantize(
            e,
            F.lit(bounds[f"__lo_{c}"]),
            F.lit(bounds[f"__hi_{c}"]),
            bits,
        )
        for c, e in zip(cols, exprs)
    ]
    zv = zorder_key(qs, bits).alias("__zv")
    return (
        df.withColumn("__zv", zv)
        .repartitionByRange(n_files, "__zv")
        .sortWithinPartitions("__zv")
        .drop("__zv")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-order curve of ``cols`` — see ``zorder_arrange``."""
    zorder_arrange(df, cols, n_files, bits).write.mode(
        "overwrite"
    ).parquet(path)


def parquet_overlap_fraction(
    path: str, col: str, lo, hi
) -> float:
    """Fraction of data files under ``path`` whose footer min/max for
    ``col`` overlaps [lo, hi] — i.e., the files a stats-pruning reader
    must actually open for that range predicate. Footer-only reads
    (pyarrow), no data pages touched. A layout-evaluation utility for
    ingest/compaction jobs and tests; at warehouse scale the same
    numbers live in the table catalog."""
    import pathlib

    import pyarrow.parquet as pq

    files = sorted(
        p
        for p in pathlib.Path(path).glob("*.parquet")
        if not p.name.startswith((".", "_"))
    )
    if not files:
        raise ValueError(f"no parquet data files under {path}")
    overlapping = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col_md = md.row_group(rg).column(ci)
                if col_md.path_in_schema != col:
                    continue
                st = col_md.statistics
                if st is None or not st.has_min_max:
                    # no stats -> reader must open the file
                    fmin, fmax = lo, hi
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None:
            raise ValueError(f"column {col!r} not found in {f}")
        if fmax >= lo and fmin <= hi:
            overlapping += 1
    return overlapping / len(files)
