"""expectations_report semantics on synthetic dirty data."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.quality import expectations_report


def test_violation_counts_and_uniqueness(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, None, 20),
            (2, "c", -5),   # dup id + negative
            (None, "d", 30),
        ],
        "id bigint, name string, v bigint",
    )
    rep = {
        r.rule: (r.n_rows, r.n_violations, r.passed)
        for r in expectations_report(
            df,
            {
                "id_not_null": F.col("id").isNull(),
                "name_not_null": F.col("name").isNull(),
                "v_non_negative": F.col("v") < 0,
            },
            unique_keys=("id",),
        ).collect()
    }
    assert rep["id_not_null"] == (4, 1, False)
    assert rep["name_not_null"] == (4, 1, False)
    assert rep["v_non_negative"] == (4, 1, False)
    # count_distinct ignores the NULL id: 4 rows, distinct {1, 2} = 2
    # -> 2 "duplicates" (the repeated 2 and the null)
    assert rep["id_unique"] == (4, 2, False)


def test_all_clean_passes(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "id bigint, v bigint")
    rows = expectations_report(
        df, {"v_positive": F.col("v") <= 0}, unique_keys=("id",)
    ).collect()
    assert all(r.passed for r in rows)
    assert {r.rule for r in rows} == {"v_positive", "id_unique"}


def test_empty_table_report(spark):
    df = spark.createDataFrame([], "id bigint, v bigint")
    rows = expectations_report(
        df, {"v_positive": F.col("v") <= 0}, unique_keys=("id",)
    ).collect()
    rep = {r.rule: (r.n_rows, r.n_violations, r.passed) for r in rows}
    # empty input: zero rows, zero violations, vacuously passing
    assert rep["v_positive"] == (0, 0, True)
    assert rep["id_unique"] == (0, 0, True)


def test_reserved_rule_names_rejected(spark):
    """Rule names colliding with internal aliases ('__*') or generated
    uniqueness rows ('<key>_unique') are rejected up front instead of
    corrupting the report (ADVICE r5)."""
    import pytest

    df = spark.createDataFrame([(1, 5)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="reserved"):
        expectations_report(df, {"__n": F.col("v") <= 0})
    with pytest.raises(ValueError, match="reserved"):
        expectations_report(df, {"__d_id": F.col("v") <= 0}, ("id",))
    with pytest.raises(ValueError, match="reserved"):
        expectations_report(
            df, {"id_unique": F.col("v") <= 0}, unique_keys=("id",)
        )
    # same name is FINE when it doesn't collide (no 'id' unique key)
    assert expectations_report(df, {"id_unique": F.col("v") <= 0}).count() == 1
