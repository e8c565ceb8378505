"""Bigram language-model scoring as a reusable pipeline operator.

``bigram_nll_scores`` fits an add-one-smoothed bigram LM on the corpus
it is given and returns one score row per document — the CCNet-style
perplexity signal a training-data pipeline thresholds to drop the
boilerplate/junk/wrong-language tail. The declared query
``bigram_perplexity_topk`` (querydefs/lm.py) is this operator plus a
top-k; the full model/determinism rationale lives there.

Determinism discipline (shared with token_cooccurrence_pmi): every
per-occurrence NLL term is ln of a rational of exact integer counts,
rounded to 9 decimals; per-document totals sum those terms as DECIMAL,
so scores are independent of task/reduction order (float sums are
not). Scale shape: unigram/bigram count relations are word-count-style
shuffle aggregates, the per-occurrence joins shuffle on token/bigram
keys, V is a one-row broadcast — all linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_zip_expr(body: str) -> str:
    """zip_with over the two adjacent slices of a ``toks`` array — THE
    corpus definition of adjacent-token bigrams, shared by this LM
    scorer and ``bigram_counts`` (querydefs/relational11.py) so the
    bigram key (separator, empty-token guard) cannot drift between
    the count table and the model scored against it."""
    return (
        "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        " slice(toks, 2, greatest(size(toks) - 1, 0)),"
        f" (a, b) -> {body})"
    )


def bigram_nll_scores(
    docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_arrays: DataFrame | None = None,
) -> DataFrame:
    """[id_col, n_bigrams, avg_nll] for every document with at least
    one bigram (single-token documents have no bigram evidence and are
    not scored — callers treat them as pass-through).

    Pass EXACTLY ONE of ``docs`` (raw text, split here) or
    ``token_arrays`` (a precomputed (id_col, toks) relation, e.g. the
    shared tokenized-corpus checkpoint — saves the two text scans the
    unigram and bigram branches would otherwise each run). Passing
    both is an error rather than a silent choice: a filtered ``docs``
    next to an unfiltered corpus checkpoint would train on and score
    the wrong corpus, so the API refuses to express it."""
    if (docs is None) == (token_arrays is None):
        raise ValueError("pass exactly one of docs or token_arrays")
    if token_arrays is not None:
        t = token_arrays.select(id_col, "toks")
    else:
        t = docs.select(id_col, F.split(text_col, " ", -1).alias("toks"))
    pair = F.expr(
        "explode("
        + bigram_zip_expr(
            "named_struct('tok_a', a, 'bigram', concat(a, ' ', b))"
        )
        + ")"
    )
    occ = t.select(id_col, pair.alias("pr")).select(
        id_col, "pr.tok_a", "pr.bigram"
    )
    uni = (
        t.select(F.explode("toks").alias("tok_a"))
        .groupBy("tok_a")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    big = occ.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_ab"))
    vsize = uni.agg(F.count(F.lit(1)).alias("vsize"))
    nll = F.round(
        F.log(
            (F.col("c_a") + F.col("vsize"))
            / (F.col("c_ab") + 1).cast("double")
        ),
        9,
    )
    terms = (
        occ.join(uni, "tok_a")
        .join(big, "bigram")
        .crossJoin(F.broadcast(vsize))
        .select(id_col, nll.alias("nll"))
    )
    ag = terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("nll").cast("decimal(20,9)")).alias("tot"),
    )
    return ag.select(
        id_col,
        "n_bigrams",
        F.round(
            F.col("tot").cast("double") / F.col("n_bigrams"), 6
        ).alias("avg_nll"),
    )
