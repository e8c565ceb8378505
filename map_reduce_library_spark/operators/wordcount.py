"""Word count — the reference's flagship workload, Spark-first.

Reference semantics (cited for parity, no code ported):

- tokenize: split on a single-space delimiter, KEEPING empty tokens
  produced by consecutive/leading/trailing spaces
  (FileWordCounter.cpp:149-177 — the reference's O(n^2) rescan is an
  accident; the semantics are exactly ``str.split(' ')``).
- per-file pre-aggregation: the reference's client counts words
  per-file before emitting (FileWordCounter.cpp:87-118) so shuffle
  traffic is one pair per (file, word). Spark's hash-based partial
  aggregation inside ``groupBy().count()`` reproduces this map-side
  combine automatically — no code needed.
- group + sum: framework shuffle keyed on lexicographic word order,
  reduce sums counts (FileWordCounter.cpp:127-136).
- output: unordered bag (MapReduceFramework.cpp:296-303); we expose an
  optional sort for presentation parity with the sorted intermediate
  keys (MapReduceClient.h:50-54,61).

Scale note: one shuffle, partial-agg'd map-side; the plan is a single
exchange on ``word`` and survives 100x scale-up. High-cardinality word
space shards evenly under hash partitioning; AQE coalesces the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """Explode ``text_col`` into one row per token.

    ``split(text, ' ', -1)`` keeps empty tokens — byte-for-byte the
    reference's tokenizer contract (FileWordCounter.cpp:149-177).
    """
    return df.select(F.explode(F.split(F.col(text_col), " ", -1)).alias(out_col))


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    sort: bool = False,
) -> DataFrame:
    """Count occurrences of each space-delimited token across all rows.

    Returns columns ``(word, cnt)``.
    """
    out = (
        tokenize(df, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if sort:
        out = out.orderBy("word")
    return out


def format_word_counts(wc: DataFrame) -> DataFrame:
    """Reference C8 output formatting ("The word X appeared N
    time(s)", FileWordCounter.cpp:271-277) as a distributed column —
    the sink-side presentation stays on executors until the caller
    collects or writes."""
    return wc.select(
        F.concat(
            F.lit("The word "),
            F.col("word"),
            F.lit(" appeared "),
            F.col("cnt").cast("string"),
            F.lit(" time(s)"),
        ).alias("line")
    )
