"""Flagship word-count: smoke via entry(), oracle-differential, and
empty-token tokenizer semantics (reference C3)."""

from conftest import SF_SMOKE, assert_oracle_match

from map_reduce_library_spark.operators.wordcount import tokenize, word_counts


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["word", "cnt"]


def test_wordcount_oracle(spark):
    assert_oracle_match(spark, "wordcount")


def test_tokenizer_keeps_empty_tokens(spark):
    # 'a  b ' splits to ['a', '', 'b', ''] — reference tokenizer
    # contract (FileWordCounter.cpp:149-177): empties preserved.
    df = spark.createDataFrame([("a  b ",)], ["text"])
    toks = [r.word for r in tokenize(df).collect()]
    assert toks == ["a", "", "b", ""]


def test_wordcount_counts_sum_to_token_count(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total_tokens = tokenize(docs).count()
    wc = word_counts(docs)
    assert wc.groupBy().sum("cnt").collect()[0][0] == total_tokens
