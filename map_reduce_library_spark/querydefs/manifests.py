"""Cross-run manifest / corpus-audit queries (VERDICT r6 item 7's
candidate family) plus two Spark-4 API surfaces the corpus had not
yet exercised (SQL LATERAL, ``mapInArrow``).

The manifest family is what a production 100-TB dedup pipeline needs
around the dedup operators themselves: a keep-manifest is the SET of
surviving doc_ids a dedup run emits, and runs are compared by
manifest DIFF (what did yesterday's corpus keep that today's drops?)
and by order-insensitive CHECKSUM (are two manifests byte-equal
without shipping either?). Both are pure fixed-width-key relational
plans — ids and 60-bit digests shuffle, never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_reduce_library_spark.operators.dedup import exact_dedup
from map_reduce_library_spark.operators.pipeline import hash_bucket
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

# DuckDB twin of operators/pipeline.py::hash_bucket with the
# ':manifest' salt (salting rationale at hash_bucket's docstring).
_MANIFEST_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':manifest'), 1, 15))"
    "::BIGINT % 100)"
)


@register(
    "dedup_manifest_diff",
    oracle=f"""
    WITH prev_manifest AS (
      SELECT min(doc_id) AS id FROM documents
      WHERE {_MANIFEST_BUCKET_SQL} < 80
      GROUP BY md5(text), length(text)
    ), curr_manifest AS (
      SELECT min(doc_id) AS id FROM documents
      GROUP BY md5(text), length(text)
    ), diff AS (
      SELECT coalesce(p.id, c.id) AS doc_id,
             CASE WHEN p.id IS NULL THEN 'added'
                  WHEN c.id IS NULL THEN 'removed'
                  ELSE 'kept' END AS status
      FROM prev_manifest p FULL JOIN curr_manifest c ON p.id = c.id
    )
    SELECT d.source, f.status, count(*) AS n
    FROM diff f JOIN documents d ON f.doc_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def dedup_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run dedup manifest diff: run A deduped yesterday's
    corpus (a deterministic 80% hash-slice standing in for the prior
    snapshot), run B deduped today's full corpus; each run's manifest
    is its kept doc_id set (min-id representative per distinct text,
    ``exact_dedup``). The diff classifies every manifest id as
    kept / added / removed and rolls counts up by source — the audit
    a recurring ingest pipeline runs before promoting a new corpus
    snapshot. Note a text group whose min-id doc arrives in the new
    20% legitimately shows as its old representative 'removed' + the
    new one 'added' — representative identity, not text identity, is
    what a manifest tracks.

    Scale shape: two digest-keyed aggregations (32-byte md5 + length
    shuffle keys — the text never leaves its scan), a full-outer join
    and a re-join to documents both on fixed-width bigint ids. No
    broadcast assumption: every relation here is corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    prev = docs.where(hash_bucket("doc_id", 100, ":manifest") < 80)
    a = exact_dedup(prev).select(F.col("doc_id").alias("id_a"))
    b = exact_dedup(docs).select(F.col("doc_id").alias("id_b"))
    diff = a.join(b, a.id_a == b.id_b, "full_outer").select(
        F.coalesce("id_a", "id_b").alias("doc_id"),
        F.when(F.col("id_a").isNull(), F.lit("added"))
        .when(F.col("id_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )
    return (
        diff.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "manifest_checksum_by_source",
    oracle="""
    SELECT source, count(*) AS n_docs,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                     || coalesce(text, '')), 1, 15))::BIGINT) AS checksum
    FROM documents GROUP BY source
    """,
)
def manifest_checksum_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-insensitive corpus checksum per source: XOR of a 60-bit
    md5 prefix of each (doc_id, text) pair. Two corpus snapshots (or
    a manifest and its replica on another cluster) compare by
    exchanging one row per source instead of any data — the cheap
    first check before a row-level ``dedup_manifest_diff``. XOR is
    the right fold: commutative/associative (partition-order-proof,
    so map-side partial aggregation is exact), and any single-row
    difference flips the digest with probability 1-2^-60. All
    JVM-side: md5 + conv + bit_xor, one 5-row-ish shuffle."""
    from map_reduce_library_spark.operators.hashing import md5_prefix60

    docs = load_table(spark, sf_dir, "documents")
    row_hash = md5_prefix60(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bit_xor(row_hash).alias("checksum"),
    )


@register(
    "duplicate_multiplicity_histogram",
    oracle="""
    SELECT n_copies, count(*) AS n_texts,
           CAST(sum(n_copies) AS BIGINT) AS n_docs
    FROM (
      SELECT count(*) AS n_copies FROM documents
      GROUP BY md5(text), length(text)
    ) GROUP BY n_copies
    """,
)
def duplicate_multiplicity_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-cluster size distribution — the first diagnostic run
    on any crawl: how many distinct texts occur exactly k times, and
    how many raw docs those clusters account for. Two chained
    aggregations, both with map-side partials; the first shuffles
    digest keys, the second shuffles at most |distinct cluster sizes|
    rows per task. The shape that tells you whether dedup will
    reclaim 2% or 40% of the corpus before you pay for it."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        exact_dedup(docs)
        .groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_texts"),
            F.sum("n_copies").alias("n_docs"),
        )
    )


@register(
    "lateral_topk_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_topk_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL
    surface for per-group top-k phrased as a join, not a window.
    Catalyst decorrelates it into WindowGroupLimit (rank computed
    with map-side group-limit pre-filtering before the shuffle, then
    once after) + a broadcast hash join against the filtered
    customer side — verified via explain("formatted"): no nested
    loop, no per-customer re-scan of orders, exactly the plan the
    equivalent window query gets, which is what makes the friendlier
    syntax free at 100 TB. Tie-break on o_orderkey keeps the LIMIT
    deterministic for the differential."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lateral_customer_in"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "lateral_orders_in"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lateral_customer_in c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lateral_orders_in o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "map_in_arrow_stats",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           length(text) AS n_chars_utf,
           length(text) - length(replace(text, ' ', '')) AS n_spaces
    FROM documents
    """,
)
def map_in_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy sibling of mapInPandas: batches
    arrive as pyarrow RecordBatches and the transforms below are
    Arrow compute kernels (C++, SIMD), never materialized into pandas
    objects. The right tier for byte-level text forensics where even
    the pandas conversion is measurable at corpus scale. Per-doc
    byte length, UTF-8 codepoint length, and space count, each with
    an exact SQL twin. Column pruning still applies — the explicit
    select feeds the Arrow scan only (doc_id, text)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_chars_utf", "n_spaces"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        stats,
        "doc_id bigint, n_bytes bigint, n_chars_utf bigint, n_spaces bigint",
    )


@register(
    "quality_tertile_mix",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY n_chars DESC NULLS LAST, doc_id)
               AS tertile
      FROM documents
    )
    SELECT lang,
           CASE tertile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars
    FROM ranked GROUP BY 1, 2
    """,
)
def quality_tertile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020
    split corpora into quality tertiles per language and trained on
    the head): ntile(3) within each lang over a per-doc quality
    ordinal — doc length here; any scored column (perplexity,
    classifier logit) plugs into the same ORDER BY. The window
    partitions by lang, so parallelism is language-count bounded —
    the accepted shape for a ~100-language corpus where each
    language fits a task; a per-lang ntile cannot be computed with
    less coordination than one sort per lang. Deterministic
    tie-break (doc_id) keeps tertile boundaries differential-stable."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc_nulls_last(), F.col("doc_id")
    )
    return (
        docs.withColumn("tertile", F.ntile(3).over(w))
        .groupBy(
            "lang",
            F.when(F.col("tertile") == 1, F.lit("head"))
            .when(F.col("tertile") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )
