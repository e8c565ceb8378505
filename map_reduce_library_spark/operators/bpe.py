"""BPE (byte-pair-encoding) vocabulary learning — the tokenizer-
training step of an LLM data pipeline, as a fully declarative
iterative Spark job.

Standard BPE (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"): start from characters (plus an
end-of-word marker), repeatedly find the most frequent adjacent
symbol pair across the corpus (weighted by word frequency) and merge
it into a new symbol. The learned merge list IS the tokenizer.

Design (vs the common driver-side dict-of-counts implementation):

- State is the distinct-WORD symbol table (word, cnt, syms) — corpus
  text is touched exactly once to build word frequencies; iterations
  scale with |vocab| x avg word length, not corpus size. At 100 TB
  the word table is the classic wordcount output (a few hundred
  million rows at web scale), fine to iterate over.
- Pair counting is one explode + groupBy per round (partial aggs
  map-side); the winning pair is a LIMIT 1 relation, NOT a collected
  scalar — it broadcasts into the merge step, so the whole learn loop
  has zero driver-side data movement (only the fixed round count).
- Merge application is a per-row ``aggregate()`` fold over the symbol
  array: non-overlapping left-to-right (greedy) replacement, the
  standard BPE application order. Zero shuffle — a scan projection.
- Each round ends in an eager ``localCheckpoint`` (same pattern as
  connected components / PageRank): without it round N's plan
  re-executes rounds 1..N-1 per downstream action, and lineage depth
  grows linearly.

Reference parity note: the reference engine has no text pipeline at
all (SURVEY.md §2D — extensions); BPE here is the north-star
tokenizer-training workload. The per-round pair count is itself the
reference's map→shuffle→reduce shape (emit pairs, group, sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"
BPE_MERGES = 6


def word_symbol_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt, syms): distinct words with corpus frequencies,
    symbols initialized to characters + the end-of-word marker."""
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return words.withColumn(
        "syms",
        F.concat(F.split("word", ""), F.array(F.lit(END_OF_WORD))),
    )


def pair_counts(symtab: DataFrame) -> DataFrame:
    """(l, r, pair_count): adjacent-symbol pair frequencies weighted
    by word count. The pair list per word is a zero-shuffle array
    projection; the groupBy ships map-side partials."""
    pairs = symtab.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms)-1),"
                " (s, i) -> struct(s AS l, syms[i+1] AS r))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(
        F.sum("cnt").alias("pair_count")
    )


def best_pair(counts: DataFrame) -> DataFrame:
    """The winning merge as a ONE-ROW RELATION (count desc, then
    lexicographic (l, r) — fully deterministic across engines and
    partitionings). TakeOrderedAndProject, no global sort."""
    return counts.orderBy(
        F.desc("pair_count"), F.asc("l"), F.asc("r")
    ).limit(1)


def apply_merge(symtab: DataFrame, best: DataFrame) -> DataFrame:
    """Merge the winning pair in every word: greedy non-overlapping
    left-to-right fold over the symbol array, with the pair delivered
    by a broadcast single-row cross join (no driver round-trip). The
    fold's CASE guard relies on && short-circuiting so element_at
    never sees an empty accumulator."""
    merged = F.expr(
        "aggregate(syms, cast(array() AS array<string>), (acc, x) ->"
        " CASE WHEN size(acc) > 0 AND element_at(acc, -1) = __bl"
        "           AND x = __br"
        "      THEN concat(slice(acc, 1, size(acc)-1),"
        "                  array(concat(__bl, __br)))"
        "      ELSE concat(acc, array(x)) END)"
    )
    return (
        symtab.crossJoin(
            F.broadcast(
                best.select(
                    F.col("l").alias("__bl"), F.col("r").alias("__br")
                )
            )
        )
        .withColumn("syms", merged)
        .drop("__bl", "__br")
    )


def bpe_learn(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges; returns (step, left_sym,
    right_sym, pair_count), step 1-based in merge order. Stops EARLY
    (fewer rows) when the corpus runs out of adjacent pairs — every
    word collapsed to one symbol — matching the pure-Python reference
    and the oracle, which both stop emitting; without the emptiness
    check the empty winner's crossJoin silently WIPED the symbol
    table (code-review r6)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    symtab = word_symbol_table(docs, text_col).localCheckpoint()
    steps: list[DataFrame] = []
    for step in range(1, n_merges + 1):
        best = best_pair(pair_counts(symtab)).localCheckpoint()
        if best.isEmpty():
            break  # fully merged: no pair left anywhere in the corpus
        steps.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        if step < n_merges:
            symtab = apply_merge(symtab, best).localCheckpoint()
    if not steps:  # zero learnable merges (e.g. all 1-char words)
        return docs.sparkSession.createDataFrame(
            [],
            "step int, left_sym string, right_sym string, pair_count long",
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, token, syms) with
    each token segmented into learned subword units. Merges MUST be
    applied in learn order (step ascending) — BPE's defining
    property.

    The merge list is tiny (the vocab budget: ≤ a few 10k rows), so
    it collects to the driver once and ships to executors inside ONE
    Arrow ``mapInPandas`` segmenter — a zero-shuffle corpus scan with
    a FLAT plan whatever the merge count. (Rounds ≤5 unrolled one
    interpolated ``aggregate()`` fold projection per merge; at a real
    32k vocab that chain explodes Catalyst analysis/codegen and the
    string interpolation is an injection-shaped footgun — VERDICT r5
    item 5 / ADVICE r5.)

    Per-token algorithm (exactly the old fold's semantics, pinned by
    the ``bpe_segmented_sample`` differential and the property test):
    merges in learn order, each applied as ONE greedy non-overlapping
    left-to-right pass. A merge whose pair is absent from the current
    symbol list is a provable no-op (the L→R pass merges iff the pair
    occurs), so it costs one set lookup — total work per token is
    O(n_merges + token_len²), not O(n_merges × token_len). A
    per-partition memo keyed by token collapses repeated words (Zipf:
    the bulk of any real corpus) to one dict hit."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    ordered = [
        (r["left_sym"], r["right_sym"])
        for r in merges.orderBy("step").collect()
    ]
    toks = docs.select(
        id_col,
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    out_schema = StructType(
        list(toks.schema.fields)
        + [StructField("syms", ArrayType(StringType()), False)]
    )

    # Zipf: frequent tokens arrive early, so a simple insert-until-full
    # cap keeps the memo's hit rate while bounding Python-worker memory
    # on high-cardinality partitions (an unbounded dict grows with
    # distinct tokens for the task's lifetime; code-review r6).
    memo_cap = 1 << 20

    def _segment_batches(batches):
        cache: dict[str, list[str]] = {}

        def seg(token: str) -> list[str]:
            hit = cache.get(token)
            if hit is not None:
                return hit
            syms = list(token) + [END_OF_WORD]
            pairs = set(zip(syms, syms[1:]))
            for a, b in ordered:
                if (a, b) not in pairs:
                    continue
                merged: list[str] = []
                for x in syms:
                    if merged and merged[-1] == a and x == b:
                        merged[-1] = a + b
                    else:
                        merged.append(x)
                syms = merged
                pairs = set(zip(syms, syms[1:]))
            if len(cache) < memo_cap:
                cache[token] = syms
            return syms

        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = pdf["token"].map(seg)
            yield pdf

    return toks.mapInPandas(_segment_batches, out_schema)
