"""Cogroup: two relations grouped on the same key, each group PAIR
handed to one pandas function — the two-input generalization of the
reference's holistic reduce (`/root/reference/MapReduceClient.h:83`
gives reduce ALL values of one key; cogroup gives it all values of the
key from BOTH inputs).  Physical shape: both sides shuffle on the key,
then `FlatMapCoGroupsInPandas` runs Arrow-batched — one shuffle per
side, no join materialization of the value lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

_SCHEMA = (
    "nationkey long, n_cust long, n_supp long, "
    "cust_median_bal double, supp_median_bal double, median_gap double"
)


@register(
    "cogroup_nation_balance",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust,
                      median(c_acctbal) AS cust_median_bal
               FROM customer GROUP BY 1),
    s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp,
                 median(s_acctbal) AS supp_median_bal
          FROM supplier GROUP BY 1)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp,
           cust_median_bal, supp_median_bal,
           cust_median_bal - supp_median_bal AS median_gap
    FROM c FULL JOIN s ON c.nationkey = s.nationkey
    """,
)
def cogroup_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation holistic merge of customers and suppliers via
    ``cogroup(...).applyInPandas``: medians are order-statistics
    (holistic — legal per the reference's reduce contract), computed on
    each side's full value list, then differenced.  Groups present on
    only one side still surface (full-outer semantics), matching the
    SQL full join of per-side aggregates.

    pandas ``median`` (linear interpolation) == DuckDB ``median`` ==
    ``quantile_cont(0.5)``; the even-count midpoint mean is the same
    IEEE expression in both engines.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_acctbal"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), "s_acctbal"
    )

    # Nested so it pickles by value (executors don't import this repo).
    def merge(left, right):
        import pandas as pd

        nk = int(
            left["nationkey"].iloc[0] if len(left) else right["nationkey"].iloc[0]
        )
        cm = float(left["c_acctbal"].median()) if len(left) else None
        sm = float(right["s_acctbal"].median()) if len(right) else None
        gap = cm - sm if cm is not None and sm is not None else None
        return pd.DataFrame(
            [
                {
                    "nationkey": nk,
                    "n_cust": len(left),
                    "n_supp": len(right),
                    "cust_median_bal": cm,
                    "supp_median_bal": sm,
                    "median_gap": gap,
                }
            ]
        )

    return (
        cust.groupBy("nationkey")
        .cogroup(supp.groupBy("nationkey"))
        .applyInPandas(merge, _SCHEMA)
    )
