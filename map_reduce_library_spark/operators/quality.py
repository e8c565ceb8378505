"""Declarative data-quality expectations — the contract gate a
production pipeline runs before promoting a snapshot (the Deequ /
dbt-test capability, engine-native).

Row-level rules (null checks, range checks, set membership,
cross-column consistency) are violation PREDICATES evaluated in ONE
ungrouped aggregate pass over the table — one scan, map-side partial
sums, a single-row result regardless of table size. Uniqueness rules
need key cardinality, so each adds one distinct-count aggregate
(hash-partial, same scan family at any scale). The report is rows of
(rule, n_rows, n_violations, passed) — the shape a scheduler gates
on and a dashboard trends.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame,
    violations: dict[str, Column],
    unique_keys: tuple[str, ...] = (),
) -> DataFrame:
    """(rule, n_rows, n_violations, passed) for each rule.

    ``violations``: rule name → Column predicate that is TRUE for a
    VIOLATING row (nulls count as violations for not-null rules by
    writing the predicate that way; otherwise write predicates
    null-safe). ``unique_keys``: column names that must be unique —
    violations = n_rows - n_distinct.
    """
    if not violations and not unique_keys:
        raise ValueError(
            "expectations_report needs at least one violation rule "
            "or unique key"
        )
    # Rule names share an aggregation row with the internal aliases
    # ('__n', '__d_<key>') and the generated '<key>_unique' rows; a
    # colliding name would silently corrupt the report (duplicate
    # rule rows or an AnalysisException on a duplicate alias), so
    # reject the reserved shapes up front (ADVICE r5).
    if len(set(unique_keys)) != len(tuple(unique_keys)):
        # duplicate keys would generate two identical __d_<k> aliases
        # and an ambiguous reference downstream (code-review r8)
        raise ValueError(f"unique_keys contains duplicates: {unique_keys}")
    reserved = {f"{k}_unique" for k in unique_keys}
    for name in violations:
        if name.startswith("__") or name in reserved:
            raise ValueError(
                f"violation rule name {name!r} is reserved: names must"
                " not start with '__' or equal '<key>_unique' for a"
                " unique key"
            )
    aggs = [
        F.sum(pred.cast("long")).alias(name)
        for name, pred in violations.items()
    ]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    aggs.extend(
        F.count_distinct(F.col(k)).alias(f"__d_{k}") for k in unique_keys
    )
    one = df.agg(*aggs)

    parts = []
    if violations:
        melted = one.unpivot(
            ["__n"] + [f"__d_{k}" for k in unique_keys],
            list(violations),
            "rule",
            "n_violations",
        )
        parts.append(melted.select("rule", "__n", "n_violations"))
    for k in unique_keys:
        parts.append(
            one.select(
                F.lit(f"{k}_unique").alias("rule"),
                F.col("__n"),
                (F.col("__n") - F.col(f"__d_{k}")).alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        F.col("__n").alias("n_rows"),
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )
