"""Relational corpus, part 6: higher-order array functions, explicit
window frames, arg-max aggregates, positional explode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "higher_order_functions",
    oracle="""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           round(list_reduce(list_transform(
                   list_filter(v, x -> x > 0), x -> x * x),
                 (a, b) -> a + b), 9) AS pos_sq_sum,
           CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
           round(list_reduce(v, (a, b) -> CASE WHEN b > a THEN b ELSE a END),
                 9) AS vmax
    FROM t
    """,
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order functions over arrays (filter → transform →
    fold), all inside Catalyst expressions — the row stays JVM-side."""
    e = _t(spark, sf_dir, "embeddings")
    return e.selectExpr(
        "vec_id",
        """round(aggregate(
             transform(filter(transform(embedding, x -> cast(x AS double)),
                              x -> x > 0),
                       x -> x * x),
             cast(0.0 AS double), (a, x) -> a + x), 9) AS pos_sq_sum""",
        """cast(size(filter(embedding, x -> x > 0)) AS int) AS n_pos""",
        """round(aggregate(
             transform(embedding, x -> cast(x AS double)),
             cast('-Infinity' AS double),
             (a, x) -> CASE WHEN x > a THEN x ELSE a END), 9) AS vmax""",
    )


@register(
    "window_frames",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS rolling3_sum,
           CAST(MIN(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_min,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS remaining
    FROM events
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS window frames: bounded rolling sum, cumulative
    min, forward-looking count. One shuffle on user_id; all three
    frames share the same sort."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(base.rowsBetween(-2, 0))
        .cast("double")
        .alias("rolling3_sum"),
        F.min(F.col("value").cast("decimal(18,2)"))
        .over(base.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_min"),
        F.count(F.lit(1))
        .over(base.rowsBetween(0, Window.unboundedFollowing))
        .cast("bigint")
        .alias("remaining"),
    )


@register(
    "argmax_aggregates",
    oracle="""
    SELECT event_type,
           arg_max(event_id, value) AS biggest_event,
           arg_min(event_id, value) AS smallest_event,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max aggregates). Distinct double values in
    this data make the arg unambiguous; with ties these would need a
    struct-max tiebreak for determinism."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", "value").alias("biggest_event"),
        F.min_by("event_id", "value").alias("smallest_event"),
        F.max("value").alias("max_value"),
    )


@register(
    "posexplode_tokens",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 20)
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
           unnest(toks) AS tok
    FROM t
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (ordinality-preserving flatten)."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")
