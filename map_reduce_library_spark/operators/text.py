"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is builtin-function expressions (whole-stage codegen, no
Python in the row path) so the same logic is expressible in the DuckDB
oracle and runs at parquet-scan speed at 100 TB — these are the
operators you run over every document in a crawl, so the constant
factor matters more than anywhere else.

The reference's only string operator is the space tokenizer
(FileWordCounter.cpp:149-177); these extend that envelope per
SURVEY.md §2D (text analysis ABSENT in reference → north-star
extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny function-word stopword lists per language. The lang-ID
# heuristic scores languages by function-word hit ratio — the same
# n-gram/function-word approach as classic langid tools, shrunk to a
# deterministic, SQL-expressible core.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "est", "que"),
}

# BPE-ish pretokenizer: letter runs, digit runs, or single other
# non-space chars — a portable approximation of GPT-style pretoken
# splits, identical in Java regex (Spark) and RE2-ish (DuckDB).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _toks(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def doc_token_arrays(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, toks): whitespace token arrays, empty tokens kept (split
    limit -1, the reference tokenizer contract). THE shared
    tokenized-corpus relation: bigram_counts, inverted_index_tokens,
    token_cooccurrence_pmi, tfidf_top_terms, and the bigram-LM
    queries all derive from it instead of each re-running the
    scan+split over the raw text (querydefs/text.py::
    shared_doc_tokens materializes it once per session+sf — at scale,
    the tokenized table is written to parquet once by an ingest job
    and every downstream query reads it)."""
    return docs.select(
        id_col, F.split(F.col(text_col), " ", -1).alias("toks")
    )


def _hit_ratio(toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"size(filter({toks}, t -> t IN ({lst}))) / "
        f"cast(greatest(size({toks}), 1) AS double)"
    )


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality statistics: token/char counts, mean token
    length, type-token ratio, stopword ratio, and a composite
    quality score in [0,1] (heuristics in the Gopher/C4 style:
    reasonable length, lexical diversity, function-word presence)."""
    en = STOPWORDS["en"]
    return (
        df.select(id_col, F.col(text_col).alias("t"))
        .withColumn("toks", _toks("t"))
        .withColumn("n_chars_calc", F.length("t").cast("bigint"))
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .withColumn("n_distinct", F.size(F.array_distinct("toks")).cast("bigint"))
        .withColumn(
            "mean_tok_len",
            (F.col("n_chars_calc") - (F.col("n_tokens") - 1))
            / F.col("n_tokens").cast("double"),
        )
        .withColumn(
            "ttr", F.col("n_distinct") / F.col("n_tokens").cast("double")
        )
        .withColumn("stop_ratio", F.expr(_hit_ratio("toks", en)))
        .withColumn(
            "quality_score",
            # Guard NULL text explicitly: least() SKIPS null args, so
            # without the guard every least(NULL_metric, 1.0) term
            # collapses to 1.0 and a null-text document scores a
            # PERFECT 1.0 — sailing through any quality gate it
            # should fail first (code-review r8, verified). NULL
            # score = "no text, no verdict", consistent with the
            # other stat columns.
            F.when(
                F.col("n_tokens").isNotNull(),
                F.round(
                    F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
                    * 0.4
                    + F.least(F.col("ttr") * 2, F.lit(1.0)) * 0.4
                    + F.least(F.col("stop_ratio") * 5, F.lit(1.0)) * 0.2,
                    6,
                ),
            ),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            "mean_tok_len",
            "ttr",
            "stop_ratio",
            "quality_score",
        )
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: argmax of function-word hit ratio, or
    'und' (undetermined) when no language scores above 2%. Ties break
    by language code order via the score structs' lexicographic max."""
    toks_df = df.select(id_col, _toks(text_col).alias("toks"))
    scored = toks_df.select(
        id_col,
        *[
            F.expr(_hit_ratio("toks", ws)).alias(f"score_{lang}")
            for lang, ws in STOPWORDS.items()
        ],
    )
    # argmax via greatest over (score, lang) structs — deterministic.
    struct_list = ", ".join(
        f"struct(score_{lang} AS s, '{lang}' AS l)" for lang in STOPWORDS
    )
    top = f"greatest({', '.join(f'score_{l}' for l in STOPWORDS)})"
    return scored.withColumn(
        "pred_lang",
        # NULL guard first: with NULL text every score is NULL, the
        # '< 0.02' test is NULL (not true), and the CASE would fall
        # into the argmax branch — whose struct-max over all-NULL
        # scores returns the lexicographically greatest language code
        # ('fr'), silently counting corrupt docs as French
        # (code-review r8, verified). NULL scores are 'und'.
        F.expr(
            f"CASE WHEN {top} IS NULL OR {top} < 0.02 "
            f"THEN 'und' ELSE array_max(array({struct_list})).l END"
        ),
    ).select(id_col, *[f"score_{lang}" for lang in STOPWORDS], "pred_lang")


def token_accounting(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token accounting: whitespace tokens, BPE-ish pretokens, chars —
    the unit economics of an LLM data pipeline. (Named
    ``token_accounting`` because ``operators.dedup.token_counts`` is a
    DIFFERENT public relation — (id, tok, cnt), the one BM25's
    ``counted=`` consumes; two same-named functions with incompatible
    shapes was an import trap, code-review r6.)"""
    return df.select(
        id_col,
        F.size(_toks(text_col)).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.length(text_col).cast("bigint").alias("chars"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition metrics, entirely as per-row
    higher-order-function expressions — ZERO shuffles, the whole
    operator is a projection inside the parquet scan (the ideal shape
    for something you run on every crawl document at 100 TB):

    - dup_token_ratio: 1 - distinct/total tokens
    - top_token_ratio: most frequent token's share (mode dominance)
    - dup_3gram_ratio: 1 - distinct/total 3-gram shingles (0 when the
      doc has fewer than 3 tokens)
    """
    g3 = (
        "CASE WHEN size(toks) >= 3 THEN "
        "transform(sequence(0, size(toks)-3), i -> "
        "concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
        "ELSE array() END"
    )
    return (
        df.select(id_col, _toks(text_col).alias("toks"))
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .withColumn("g3", F.expr(g3))
        .select(
            id_col,
            "n_tokens",
            (
                1
                - F.size(F.array_distinct("toks"))
                / F.col("n_tokens").cast("double")
            ).alias("dup_token_ratio"),
            # mode count via adjacent-run max over the SORTED array:
            # O(n log n) per row. The transform(distinct, d ->
            # filter(...)) form is O(distinct × n) — quadratic on
            # mostly-distinct crawl docs (code-review r6); the sf0.01
            # oracle keeps that form, so the two different algorithms
            # computing the same mode count is itself a differential.
            F.expr(
                "aggregate(array_sort(toks),"
                " named_struct('prev', cast(null AS string),"
                "              'run', 0, 'best', 0),"
                " (acc, x) -> named_struct("
                "   'prev', x,"
                "   'run', IF(acc.prev <=> x, acc.run + 1, 1),"
                "   'best', greatest(acc.best,"
                "                    IF(acc.prev <=> x, acc.run + 1, 1))),"
                " acc -> acc.best)"
                " / cast(size(toks) AS double)"
            ).alias("top_token_ratio"),
            F.expr(
                "CASE WHEN size(g3) = 0 THEN 0.0 ELSE "
                "1 - size(array_distinct(g3)) / cast(size(g3) AS double) END"
            ).alias("dup_3gram_ratio"),
        )
    )


# C4/Gopher-flavored keep thresholds, shared with the SQL oracle.
QF_MIN_TOKENS = 10
QF_MAX_TOKENS = 1000
QF_MIN_MEAN_TOK_LEN = 2.0
QF_MAX_MEAN_TOK_LEN = 12.0
QF_MIN_STOP_RATIO = 0.01
QF_MIN_TTR = 0.2
QF_LANG = "en"


def quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The canonical pretraining-corpus filter pass: join the
    per-document quality stats and language ID, emit a ``keep``
    verdict plus a comma-joined ``fail_reasons`` audit column (empty
    when kept). One equi-join of two scan-shaped relations — at
    100 TB both sides are projections of the same scan, and Catalyst
    dedups the scan via exchange reuse."""
    stats = text_stats(df, text_col, id_col)
    langs = lang_id(df, text_col, id_col).select(id_col, "pred_lang")
    j = stats.join(langs, id_col)
    # 'null' leads the reason list: for a NULL-text doc every numeric
    # gate condition is NULL, F.when(NULL, tag) yields NULL, and
    # concat_ws silently skips it — without the explicit tag the
    # audit column would claim only a language mismatch for a doc
    # that has no text at all (code-review r8, verified).
    reasons = [
        (F.col("n_tokens").isNull(), "null"),
        (
            ~F.col("n_tokens").between(QF_MIN_TOKENS, QF_MAX_TOKENS),
            "len",
        ),
        (
            ~F.col("mean_tok_len").between(
                QF_MIN_MEAN_TOK_LEN, QF_MAX_MEAN_TOK_LEN
            ),
            "tok_len",
        ),
        (F.col("stop_ratio") < QF_MIN_STOP_RATIO, "stop"),
        (F.col("ttr") < QF_MIN_TTR, "ttr"),
        (F.col("pred_lang") != QF_LANG, "lang"),
    ]
    fail = F.concat_ws(
        ",", *[F.when(cond, F.lit(tag)) for cond, tag in reasons]
    )
    return j.select(
        id_col,
        "n_tokens",
        "quality_score",
        "pred_lang",
        fail.alias("fail_reasons"),
        (fail == "").alias("keep"),
    )


def doc_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Two content fingerprints: exact (md5 of raw text) and bag
    (md5 of the sorted distinct token set — invariant to word order,
    catching shuffled near-copies that exact hashing misses)."""
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("fp_exact"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(_toks(text_col))), " ")
        ).alias("fp_bag"),
    )


_UNICODE_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(
    df: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """Unicode-normalize a text column at INGEST time (Arrow
    ``mapInPandas``), returning the input schema unchanged.

    This is the stage ``operators/dedup.py::normalize_for_dedup``
    points at for NFC-variant text: Spark has no JVM builtin for
    unicode normalization, and the dedup module refuses Python in the
    per-shingle hot path — but ingest runs ONCE per document (not once
    per shingle), so an Arrow-batched pass here is the right cost
    point. Composed ("é", U+00E9) and decomposed ("e"+U+0301) spellings
    of the same text hash to different shingles raw; after this stage
    they are byte-identical, so every downstream fingerprint
    (exact-dedup md5, MinHash, SimHash) unifies them for free.

    Scale: one narrow Arrow pass, no shuffle; batches stream through
    ``unicodedata.normalize`` (C-implemented in CPython). Nulls pass
    through; non-text columns ride along untouched. Written for the
    write-your-canonical-corpus-once pipeline shape — normalize at
    ingest, then every query reads canonical bytes."""
    import unicodedata

    if form not in _UNICODE_FORMS:
        raise ValueError(f"form must be one of {_UNICODE_FORMS}: {form!r}")
    if text_col not in df.columns:
        raise ValueError(f"no column {text_col!r} in {df.columns}")
    schema = df.schema
    if not schema[text_col].dataType.typeName() == "string":
        raise ValueError(
            f"{text_col!r} must be string, got {schema[text_col].dataType}"
        )

    def batches(it):
        for pdf in it:
            pdf[text_col] = pdf[text_col].map(
                lambda s: unicodedata.normalize(form, s)
                if isinstance(s, str)
                else s
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# PII scrubbing: the conservative regex family every training-data
# pipeline runs before anything else. Patterns are deliberately
# restricted to syntax with identical semantics in Java regex (Spark)
# and RE2 (the DuckDB oracle): character classes, bounded repetition,
# no lookaround, no word boundaries. \d is ASCII [0-9] in both.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_LONGNUM = r"\d{6,}"


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and long digit runs (account /
    card / phone shaped) with typed placeholders, counting each class.

    Order matters and is part of the contract: emails are counted and
    removed first (their domains can contain digit runs), then IPs
    (dotted digit quads would otherwise be double-counted by the
    digit-run rule), then remaining runs of 6+ digits. Counts are
    taken on the intermediate strings the matching stage actually
    sees, so n_ips never includes an address inside an email, etc.

    Pure JVM-side regexp_count/regexp_replace projections — one
    narrow pass, no shuffle, whole-stage codegen; this is the shape
    that streams through 100 TB at scan speed."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    return df.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_LONGNUM)).alias("n_longnums"),
        F.regexp_replace(after_ip, PII_LONGNUM, "<NUM>").alias("redacted"),
    )


# ---- BM25 retrieval ------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
# The corpus's fixed bag-of-terms benchmark query (shared by the BM25
# query and the hybrid-RRF fusion so both rank the same candidates).
BM25_QUERY_TERMS = ("hash", "join", "scan")


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    counted: DataFrame | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a bag-of-terms query.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))  — the
               non-negative (+1) form Lucene uses.
    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Plan shape for 100 TB: the (doc, tok, cnt) relation is filtered to
    the query's terms BEFORE any join, so the candidate set is |docs
    containing a query term|, not |corpus|; per-term document
    frequencies are a tiny aggregate broadcast into the scoring join;
    document lengths come from one groupBy over the token relation
    (pass ``counted=`` to reuse a materialized token-count table — the
    inverted-index-build-once pattern); the final top-k is
    TakeOrderedAndProject, not a global sort. Scores are rounded to 9
    decimals BEFORE ranking so the cut is reproducible across engines
    and summation orders.
    """
    if counted is None:
        from map_reduce_library_spark.operators.dedup import (
            token_counts as _distinct_token_counts,
        )

        counted = _distinct_token_counts(df, text_col, id_col)
    # Corpus size rides a one-row broadcast relation (the corpus's
    # scalar-attach convention — see lm.py's vsize, PMI's n_docs)
    # rather than a driver-side count() action at plan-build time.
    n_rel = df.agg(F.count(F.lit(1)).alias("n_docs"))
    dl = counted.groupBy(id_col).agg(F.sum("cnt").alias("dl"))
    avg_rel = dl.agg(F.avg("dl").alias("avgdl"))
    qt = counted.where(F.col("tok").isin(list(query_terms)))
    dfreq = qt.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    w = idf * (F.col("cnt") * (k1 + 1.0)) / (
        F.col("cnt")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        qt.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avg_rel))
        .crossJoin(F.broadcast(n_rel))
        .withColumn("w", w)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.round(F.sum("w"), 9).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(top_k)
    )
