"""Temporal joins Spark lacks as builtins: as-of join and range join.

Both are composed from existing DataFrame operators (SURVEY.md §2D
custom-operator rule: composition first, Pandas UDF only if semantics
demand it — they don't here), so Catalyst still owns the physical
plan.

- ``asof_join``: for each left row, attach the latest right row with
  ``right.ts <= left.ts`` within the same ``by`` key. Implemented as
  union + window last-non-null: ONE shuffle on the key, an
  in-partition sort, no per-key loops, no range explosion — the
  scale-correct plan (a naive inequality join is O(n·m) per key).
- ``range_join``: pair rows whose timestamps fall within a tolerance.
  Implemented by time-bucketing both sides and equi-joining on
  (key, bucket) ± neighbor buckets, then refining the exact predicate
  — turning an inequality join into a hash join whose fan-out is
  bounded by bucket width, the standard scale trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (latest right at-or-before each left row).

    Returns ``left`` plus ``{c}{suffix}`` for each of ``right_cols``
    (NULL when no prior right row exists). Ties on ``ts`` resolve to
    the right row (right sorts before left at equal ts), matching
    at-or-before semantics. Among MULTIPLE right rows at the same
    (by, ts), the greatest ``right_cols`` tuple wins — an explicit
    total order; without it the window sort was tie-ambiguous and the
    attached row could vary per run/partitioning (code-review r6;
    DuckDB's native ASOF picks arbitrarily on such ties, so oracle
    differentials need tie-free data — pinned by test).

    The attached columns are carried as ONE struct filled with a
    single last(ignorenulls) — filling each column independently
    would, when the latest prior right row has a NULL in one column,
    backfill that column from an OLDER right row, stitching together
    columns from different rows (DuckDB/pandas ASOF attach the whole
    row or nothing).
    """
    rdt = dict(right.dtypes)
    struct_type = "struct<" + ",".join(f"{c}:{rdt[c]}" for c in right_cols) + ">"
    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "__asof", F.lit(None).cast(struct_type)
    )
    rt = right.select(
        F.col(ts),
        F.col(by),
        F.lit(0).alias("__side"),
        F.struct(*right_cols).alias("__asof"),
    )
    # Align schemas for the union.
    for c in left.columns:
        if c not in (ts, by):
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(ts).asc(), F.col("__side").asc(), F.col("__asof").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__asof", F.last("__asof", ignorenulls=True).over(w)
    )
    return filled.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(f"__asof.{c}").alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    tolerance_seconds: int,
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Pair rows of ``left`` and ``right`` sharing ``by`` whose
    timestamps differ by at most ``tolerance_seconds`` (left.ts >=
    right.ts). Bucketed: each left row probes its own and the previous
    bucket only, so join fan-out stays O(rows-per-bucket), not O(n·m).
    Output columns are prefixed ``{left_alias}_`` / ``{right_alias}_``.

    ``tolerance_seconds`` must be positive: 0 divides the bucket
    width away (DIVIDE_BY_ZERO under Spark 4's default ANSI mode —
    code-review r6); 'at most 0 seconds apart' is an equi-join on
    (by, ts), which needs no range machinery.
    """
    if tolerance_seconds <= 0:
        raise ValueError(
            "tolerance_seconds must be > 0; for exact-timestamp "
            f"matches join on ({by}, {ts}) directly"
        )
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / (tolerance_seconds * 1_000_000))  # noqa: E731
    lt = left.select(
        F.col(by).alias("__by"),
        bucket(ts).alias("__bk"),
        *[F.col(c).alias(f"{left_alias}_{c}") for c in left.columns],
    )
    rt = right.select(
        F.col(by).alias("__by"),
        bucket(ts).alias("__bk_r"),
        *[F.col(c).alias(f"{right_alias}_{c}") for c in right.columns],
    )
    # left bucket b matches right buckets {b, b-1}: explode the probe.
    lt2 = lt.withColumn(
        "__bk_r", F.explode(F.array(F.col("__bk"), F.col("__bk") - 1))
    )
    lts, rts = f"{left_alias}_{ts}", f"{right_alias}_{ts}"
    out = (
        lt2.join(rt, ["__by", "__bk_r"])
        .where(
            (F.col(lts) >= F.col(rts))
            & (
                F.unix_micros(F.col(lts)) - F.unix_micros(F.col(rts))
                <= tolerance_seconds * 1_000_000
            )
        )
        .drop("__by", "__bk", "__bk_r")
    )
    return out
