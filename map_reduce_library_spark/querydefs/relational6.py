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
           /* empty-list guard: DuckDB list_reduce ERRORS on an empty
              input while Spark's aggregate(..., 0.0, ...) returns the
              seed — an all-nonpositive vector would abort the whole
              oracle (code-review r6) */
           CASE WHEN len(list_filter(v, x -> x > 0)) = 0 THEN 0.0
                ELSE round(list_reduce(list_transform(
                        list_filter(v, x -> x > 0), x -> x * x),
                      (a, b) -> a + b), 9) END AS pos_sq_sum,
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
    WITH m AS (SELECT event_type, max(value) AS mx, min(value) AS mn
               FROM events GROUP BY event_type)
    SELECT e.event_type,
           max(CASE WHEN e.value = m.mx THEN e.event_id END)
             AS biggest_event,
           min(CASE WHEN e.value = m.mn THEN e.event_id END)
             AS smallest_event,
           max(e.value) AS max_value
    FROM events e JOIN m USING (event_type)
    GROUP BY e.event_type
    """,
)
def argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max aggregates) with an EXPLICIT struct
    tiebreak: the arg is max_by/min_by over (value, event_id), so
    among tied extreme values the greatest/least event_id wins —
    sf0.1 really does carry value ties (event_type 'error' has two
    rows at its minimum), and the bare-column form was
    partitioning-dependent there (code-review r6; the docstring's
    old 'distinct values' assumption was false). The oracle derives
    the same winner relationally (max/min id over rows equal to the
    group extreme) — DuckDB's arg_max has no composite-value form."""
    ev = _t(spark, sf_dir, "events")
    tie = F.struct("value", "event_id")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", tie).alias("biggest_event"),
        F.min_by("event_id", tie).alias("smallest_event"),
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
