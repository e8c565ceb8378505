"""BPE vocabulary learning: hand-checked merges, greedy application
semantics, determinism, and the monotone-count invariant."""

from __future__ import annotations

from map_reduce_library_spark.operators.bpe import (
    bpe_learn,
    bpe_segment,
    pair_counts,
    word_symbol_table,
)
from tests.conftest import SF_SMOKE


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_hand_checked_two_merges(spark):
    """Corpus 'ab ab ab': (a,b) and (b,</w>) tie at 3; lexicographic
    tie-break picks (a,b); round 2 merges the resulting (ab,</w>)."""
    docs = _mk_docs(spark, ["ab ab ab"])
    got = [
        (r.step, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn(docs, 2).orderBy("step").collect()
    ]
    assert got == [(1, "a", "b", 3), (2, "ab", "</w>", 3)]


def test_greedy_overlap_and_lexicographic_tiebreak(spark):
    """'aaaa' → [a,a,a,a,</w>]: (a,a) counts 3 but greedy merging
    yields [aa,aa,</w>] (two merges, not three). Round 2 ties
    (aa,aa)=1 vs (aa,</w>)=1 → '</w>' sorts before 'aa'."""
    docs = _mk_docs(spark, ["aaaa"])
    got = [
        (r.step, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn(docs, 3).orderBy("step").collect()
    ]
    assert got[0] == (1, "a", "a", 3)
    assert got[1] == (2, "aa", "</w>", 1)
    assert got[2] == (3, "aa", "aa</w>", 1)


def test_word_weighting_uses_corpus_frequency(spark):
    """Pair counts weight by word frequency, not distinct words: 'xy'
    appearing 5 times beats 'qrstuv' appearing once."""
    docs = _mk_docs(spark, ["xy xy xy xy xy qrstuv"])
    step1 = bpe_learn(docs, 1).collect()[0]
    assert (step1.left_sym, step1.right_sym) in {("x", "y"), ("y", "</w>")}
    assert step1.pair_count == 5


def test_merge_counts_never_increase(spark):
    """Each round's winning count <= the previous round's: a merge can
    only create pairs at most as frequent as itself, and survivors
    were already below the old max. Run on the real smoke corpus."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    counts = [
        r.pair_count for r in bpe_learn(docs, 4).orderBy("step").collect()
    ]
    assert len(counts) == 4 and all(c > 0 for c in counts)
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_learn_is_partition_invariant(spark):
    """Same merges regardless of input partitioning (the LIMIT 1
    winner is a deterministic total order, not partition luck)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = bpe_learn(docs, 3).orderBy("step").collect()
    b = bpe_learn(docs.repartition(13), 3).orderBy("step").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_segment_matches_learn_time_state(spark):
    """Applying the merge list in learn order reproduces the learn
    loop's final symbol table for every corpus word."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    merges = bpe_learn(docs, 3)

    # final learn-time state: replay apply_merge via the operator
    from map_reduce_library_spark.operators.bpe import apply_merge

    symtab = word_symbol_table(docs)
    for row in merges.orderBy("step").collect():
        one = spark.createDataFrame(
            [(row.left_sym, row.right_sym)], "l string, r string"
        )
        symtab = apply_merge(symtab, one)
    want = {r.word: list(r.syms) for r in symtab.collect()}

    seg = bpe_segment(docs, merges)
    got = {}
    for r in seg.select("token", "syms").distinct().collect():
        got[r.token] = list(r.syms)
    assert got == want


def test_pair_counts_sum_preserved(spark):
    """Sanity on the counting relation: total adjacent pairs ==
    sum over words of cnt * (len(syms) - 1)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    wt = word_symbol_table(docs)
    from pyspark.sql import functions as F

    want = wt.select(
        F.sum(F.col("cnt") * (F.size("syms") - 1)).alias("s")
    ).collect()[0].s
    got = pair_counts(wt).select(F.sum("pair_count").alias("s")).collect()[0].s
    assert got == want


def test_segment_with_quote_and_backslash_symbols(spark):
    """Merge symbols containing SQL-literal metacharacters (quote,
    backslash) must round-trip through the fold-expression chain."""
    docs = _mk_docs(spark, ["a'b a'b a\\c a\\c a\\c"])
    merges = bpe_learn(docs, 2)
    seg = bpe_segment(docs, merges)
    toks = {r.token for r in seg.collect()}
    assert toks == {"a'b", "a\\c"}
    # every token still reassembles to itself + the end marker
    for r in seg.collect():
        assert "".join(r.syms) == r.token + "</w>"
