"""Skew-handling utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting handles moderate skew automatically (enabled
in session.py); these explicit operators are for the pathological
cases a 100-TB pipeline hits — a handful of keys owning a double-digit
percentage of rows (null keys, bot user_ids, empty-string documents) —
where deterministic salting beats runtime re-planning.

Both operators are pure DataFrame compositions and preserve exact
semantics for the join types they accept: results equal the unsalted
equivalents row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``key``: left rows get a
    deterministic pseudo-random salt in [0, salt); ``right`` is
    replicated ``salt`` times so every (key, salt) bucket can meet.
    The shuffle key becomes (key, salt) — hot keys spread over
    ``salt`` reducers at the cost of replicating the (small) right
    side, which is exactly the trade you want when right ≪ left.

    Left-row salt derives from xxhash64 of ALL left columns (not a
    random() — deterministic retries matter at scale). Limitation:
    rows BYTE-IDENTICAL in every column share one salt, so a hot key
    whose rows are full duplicates (the same bot row repeated 10⁹
    times) does not spread — run exact dedup first, or add a
    discriminating column (ingest offset, file name) before salting.
    Distinct-content rows under one hot key (the common case) spread
    uniformly.

    Only ``how`` in {'inner', 'left', 'left_semi'} is legal: the right
    side is replicated ``salt`` times, so right/full outer joins would
    emit each unmatched right row ``salt`` times."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left", "left_outer", "left_semi", "semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r}: "
            "the replicated right side would duplicate unmatched right "
            "rows under right/full outer semantics"
        )
    # The internal salt column must not clobber (and then drop) a
    # caller's column of the same name — e.g. the output of a previous
    # salting stage — which would be silent data loss relative to the
    # plain join this function promises parity with (code-review r8).
    for side, cols in (("left", left.columns), ("right", right.columns)):
        if "__salt" in cols:
            raise ValueError(
                f"{side} input already has a '__salt' column; rename it "
                "before salted_join"
            )
    left_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    right_rep = right.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = left_salted.join(right_rep, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 16,
    value_type: str = "decimal(28,2)",
) -> DataFrame:
    """SUM aggregation immune to hot keys: phase 1 aggregates on
    (key, salt) — hot keys split across ``salt`` partial groups —
    phase 2 merges the partials per key. Spark's own partial
    aggregation already does this per-task; explicit salting adds the
    cross-task split for keys hot enough to overwhelm single reducers.
    Decimal accumulation makes the result independent of partial
    order AND bit-equal to an unsalted decimal sum — but each value is
    first CAST to ``value_type``, so inputs with more fractional
    digits than its scale are rounded before summing (the 2dp default
    fits money columns; pass e.g. 'decimal(28,9)' for finer data —
    code-review r6: the old docstring claimed bit-equality to a
    direct sum unconditionally).

    The salt hashes ALL columns (row content), never
    monotonically_increasing_id(): a nondeterministic expression
    upstream of a shuffle re-salts rows differently when a stage
    retries after a fetch failure, silently double-counting or
    dropping rows (SPARK-23207). Content-hashing keeps every retry
    bit-identical; rows identical in all columns land in the same
    (key, salt) partial, which is harmless for sum/count."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if "__salt" in df.columns:  # same clobber guard as salted_join
        raise ValueError(
            "input already has a '__salt' column; rename it before "
            "two_phase_agg"
        )
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt))
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(F.col(value).cast(value_type)).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("__psum").cast("double").alias(f"sum_{value}"),
        F.sum("__pcnt").alias("cnt"),
    )
