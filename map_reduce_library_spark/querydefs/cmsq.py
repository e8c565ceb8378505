"""Count-Min sketch, driver-checked end-to-end.

The whole sketch is deterministic integer arithmetic (see
operators/cms.py), so unlike the HLL/approx-percentile family the
oracle verifies the sketch CONSTRUCTION and the estimates, not just
row counts: DuckDB rebuilds the identical d x w cell relation from the
same md5-based hash family and must agree on every estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.cms import (
    CMS_A,
    CMS_B,
    CMS_D,
    CMS_P,
    CMS_W,
    cms_build,
    cms_lookup,
)
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

CMS_TOP = 20

_X = f"('0x' || substr(md5(token), 1, 15))::BIGINT % {CMS_P}"

_CELLS = " UNION ALL ".join(
    f"SELECT {j} AS j, ((x * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P}) % {CMS_W}"
    f" AS bucket FROM x"
    for j in range(CMS_D)
)

_PROBES = " UNION ALL ".join(
    f"SELECT token, exact_n, {j} AS j,"
    f" ((x * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P}) % {CMS_W} AS bucket"
    f" FROM ex"
    for j in range(CMS_D)
)


@register(
    "cms_frequency_estimates",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    x AS (SELECT {_X} AS x FROM tok),
    cells AS ({_CELLS}),
    cms AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY j, bucket),
    exact AS (
      SELECT token, count(*) AS exact_n
      FROM tok GROUP BY token
      ORDER BY exact_n DESC, token LIMIT {CMS_TOP}
    ),
    ex AS (SELECT token, exact_n, {_X} AS x FROM exact),
    probes AS ({_PROBES}),
    lk AS (
      SELECT p.token, p.exact_n, min(coalesce(c.cnt, 0)) AS est_n
      FROM probes p LEFT JOIN cms c USING (j, bucket)
      GROUP BY p.token, p.exact_n
    )
    SELECT token, exact_n, est_n, est_n - exact_n AS overcount
    FROM lk
    """,
)
def cms_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a {CMS_D}x{CMS_W} Count-Min sketch over every token
    occurrence in ``documents``, then estimate the frequencies of the
    {CMS_TOP} most frequent exact tokens. Output carries exact and
    estimated counts side by side plus the (always >= 0) overcount, so
    the one-sided error guarantee is visible in the verified result.

    Plan shape: the sketch build's shuffle key domain is d*w = 16k
    cells — map-side combine collapses it to a constant-size exchange
    at any corpus scale; the sketch is then an explicit broadcast for
    the probe join; the exact top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ", -1)).alias("token"))
    cms = cms_build(tok, "token")
    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(CMS_TOP)
    )
    est = cms_lookup(cms, exact.select("token"), "token")
    return exact.join(est, "token").select(
        "token",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    )
