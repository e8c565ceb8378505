"""Query registry: the driver-checked corpus.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, spark_callable, oracle_sql)`` triple. The spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL
DuckDB runs on the same parquet (omitted only for genuinely
non-SQL-expressible operators — the driver then records a weaker
rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark plan and the SQL so the driver's sorted-by-name value hash
compares apples to apples.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its DuckDB oracle) to the corpus."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# Registration modules (import side-effects populate the registry).
# Highest-risk families first: the driver verifies registry entries in
# order (and may cap or time out partway through the corpus), so the
# queries that most need a hard correctness signal must register first.
from map_reduce_library_spark.querydefs import mapreduce_parity  # noqa: E402,F401
from map_reduce_library_spark.querydefs import text  # noqa: E402,F401
from map_reduce_library_spark.querydefs import dedup  # noqa: E402,F401  (needs text's oracle)
from map_reduce_library_spark.querydefs import similarity  # noqa: E402,F401
from map_reduce_library_spark.querydefs import streaming  # noqa: E402,F401
from map_reduce_library_spark.querydefs import temporal  # noqa: E402,F401
from map_reduce_library_spark.querydefs import pipeline  # noqa: E402,F401
from map_reduce_library_spark.querydefs import multimodal  # noqa: E402,F401
from map_reduce_library_spark.querydefs import extensibility  # noqa: E402,F401
from map_reduce_library_spark.querydefs import cogroup  # noqa: E402,F401
from map_reduce_library_spark.querydefs import skewq  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational10  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational9  # noqa: E402,F401
from map_reduce_library_spark.querydefs import approx  # noqa: E402,F401
from map_reduce_library_spark.querydefs import wordcount  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational2  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational3  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational4  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational5  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational6  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational7  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational8  # noqa: E402,F401

# Registry order = driver check order.  Rebuild the dicts so queries
# with no green CORRECTNESS row yet come first (hash-oracled before
# rows-only), and already-verified ones re-check last.  Update
# _VERIFIED with each round's green rows.
_VERIFIED = {
    # CORRECTNESS_r01.json: all 50 checked rows passed (rows+schema+hash).
    "wordcount", "filter_project", "pricing_summary", "shipping_priority",
    "local_supplier_volume", "customer_order_stats_outer",
    "semi_join_customers_with_urgent", "anti_join_parts_never_ordered",
    "distinct_agg_having", "rollup_order_priority", "topk_expensive_orders",
    "set_ops_nations", "window_user_running", "window_top2_per_nation",
    "scalar_functions", "conditional_agg_case", "json_extract_props",
    "pivot_status_by_priority", "cube_returnflag_linestatus",
    "above_avg_orders", "regex_like_filters", "date_arithmetic",
    "array_functions", "null_handling", "listagg_nations_per_region",
    "exact_percentiles", "value_histogram", "unpivot_customer_metrics",
    "stat_aggregates", "grouping_sets_explicit", "hypertable_rollup_daily",
    "three_valued_in_semantics", "min_cost_per_part",
    "large_volume_customers", "higher_order_functions", "window_frames",
    "argmax_aggregates", "posexplode_tokens", "order_priority_checking",
    "shipmode_priority", "promo_revenue_pct",
    "disjunctive_predicate_revenue", "latest_shipper_per_order",
    "global_sales_opportunity", "ntile_window_stats",
    "map_column_functions", "volume_shipping", "market_share",
    "product_type_profit", "important_part_value",
}

_order = sorted(QUERIES, key=lambda n: (n in _VERIFIED, n not in ORACLES))
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
