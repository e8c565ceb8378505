"""Span-level dedup: CDC chunking + boilerplate n-gram mining."""

from __future__ import annotations

from conftest import SF_CORRECTNESS, assert_oracle_match

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.cdc import (
    CDC_DIVISOR,
    cdc_chunk_arrays,
    cdc_chunks,
)
from map_reduce_library_spark.operators.text import doc_token_arrays
from map_reduce_library_spark.queries import QUERIES


def test_cdc_chunk_dedup_oracle(spark):
    assert_oracle_match(spark, "cdc_chunk_dedup")


def test_boilerplate_ngram_spans_oracle(spark):
    assert_oracle_match(spark, "boilerplate_ngram_spans")


def test_cdc_chunks_partition_the_token_stream(spark):
    """Chunks are a PARTITION of each doc's token sequence: joining
    them back in order reconstructs the original text exactly."""
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rebuilt = (
        cdc_chunk_arrays(doc_token_arrays(docs))
        .select("doc_id", F.array_join("chunks", " ").alias("again"))
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    assert rebuilt.where(~F.col("again").eqNullSafe(F.col("text"))).count() == 0
    assert rebuilt.count() == docs.count()


def _chunks_of(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    return [
        r.chunk_text
        for r in cdc_chunks(doc_token_arrays(df))
        .orderBy("chunk_pos")
        .collect()
    ]


def test_cdc_boundaries_resynchronize_after_insertion(spark):
    """THE content-defined property (what fixed-size chunking lacks):
    prepending a token only perturbs the first chunk — every chunk
    after the first cut point is byte-identical, so shared spans
    dedup wherever they sit in the document."""
    from map_reduce_library_spark.operators.pipeline import hash_bucket

    base = "the fast key order sort table scan merge part window small hash join batch stream"
    a = _chunks_of(spark, base)
    assert len(a) >= 2, "fixture too short to produce multiple chunks"

    # find one cut token and one non-cut token to prepend
    toks = ["alpha", "beta", "gamma", "delta", "zig", "zag", "qq", "zz"]
    probe = spark.createDataFrame([(t,) for t in toks], "tok string")
    cut_flags = {
        r.tok: r.iscut
        for r in probe.select(
            "tok", (hash_bucket("tok", CDC_DIVISOR) == 0).alias("iscut")
        ).collect()
    }
    noncut = next(t for t in toks if not cut_flags[t])
    b = _chunks_of(spark, f"{noncut} {base}")
    assert b[0] == f"{noncut} {a[0]}"
    assert b[1:] == a[1:]

    cut = next((t for t in toks if cut_flags[t]), None)
    if cut is not None:  # a cut token becomes its own 1-token chunk
        c = _chunks_of(spark, f"{cut} {base}")
        assert c[0] == cut
        assert c[1:] == a


def test_cdc_chunking_is_a_flat_zero_shuffle_plan(spark):
    """The chunk build must stay one fold projection over the scan:
    no Exchange, no explode-then-window, no Python."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    plan = (
        cdc_chunk_arrays(doc_token_arrays(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def _py_cdc(tokens: list[str], cut: dict[str, bool]) -> list[str]:
    """Pure-Python reference chunker: a cut token ends its chunk."""
    out, cur = [], []
    for t in tokens:
        cur.append(t)
        if cut[t]:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


def test_cdc_matches_python_reference_on_random_corpora(spark):
    """Hypothesis differential: the Spark fold chunker == the textbook
    sequential chunker on random small-alphabet token streams (small
    alphabets force frequent cut tokens, chunk boundaries at position
    0, at the end, and back-to-back cuts)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from map_reduce_library_spark.operators.pipeline import hash_bucket

    alphabet = ["a", "b", "c", "dd", "ee", "ff", "ggg", "hh"]
    probe = spark.createDataFrame([(t,) for t in alphabet], "tok string")
    cut = {
        r.tok: r.c
        for r in probe.select(
            "tok", (hash_bucket("tok", CDC_DIVISOR) == 0).alias("c")
        ).collect()
    }
    assert any(cut.values()), "fixture alphabet has no cut token"

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(alphabet), min_size=1, max_size=30),
            min_size=1,
            max_size=5,
        )
    )
    def run(docs):
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id bigint, text string",
        )
        got = {
            r.doc_id: list(r.chunks)
            for r in cdc_chunk_arrays(doc_token_arrays(df)).collect()
        }
        want = {i: _py_cdc(toks, cut) for i, toks in enumerate(docs)}
        assert got == want

    run()


def test_boilerplate_short_docs_produce_no_grams(spark):
    """Docs with fewer than BP_NGRAM tokens must contribute zero
    grams (the sequence() guard — Spark's sequence(1, 0) counts DOWN
    and would otherwise emit junk windows)."""
    from map_reduce_library_spark.querydefs.spans import BP_NGRAM

    df = spark.createDataFrame(
        [(0, "a b c"), (1, " ".join(["w"] * BP_NGRAM))],
        "doc_id bigint, text string",
    )
    grams = df.select(
        F.explode(
            F.expr(
                f"IF(size(split(text, ' ', -1)) >= {BP_NGRAM},"
                f" transform(sequence(1, size(split(text, ' ', -1)) - {BP_NGRAM - 1}),"
                f"  i -> concat_ws(' ', slice(split(text, ' ', -1), i, {BP_NGRAM}))),"
                " cast(array() AS array<string>))"
            )
        ).alias("gram")
    )
    rows = grams.collect()
    assert len(rows) == 1 and rows[0].gram == " ".join(["w"] * BP_NGRAM)


def test_repeated_span_intervals_planted(spark):
    """Planted-span property (VERDICT r7 item 3): two otherwise-unique
    documents share one L-token span -> the operator reports exactly
    that interval in both docs, maximal (not a token wider), and
    nothing else. A third doc repeating its OWN paragraph is caught
    too (within-document repetition counts)."""
    from map_reduce_library_spark.operators.spans import (
        SPAN_NGRAM,
        repeated_span_intervals,
    )
    import pyspark.sql.functions as F

    planted = [f"shared{i}" for i in range(12)]  # L=12 tokens
    doc0 = [f"a{i}" for i in range(7)] + planted + [f"z{i}" for i in range(5)]
    doc1 = [f"b{i}" for i in range(3)] + planted + [f"y{i}" for i in range(9)]
    selfrep = [f"c{i}" for i in range(4)]
    doc2 = selfrep + [f"mid{i}" for i in range(6)] + selfrep  # L=4 < N=5
    docs = spark.createDataFrame(
        [(0, doc0), (1, doc1), (2, doc2)],
        "doc_id bigint, toks array<string>",
    )

    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_span_intervals(docs).collect()
    }
    # doc0: planted occupies 1-based tokens 8..19; doc1: tokens 4..15.
    # doc2's 4-token self-repeat is below the N=5 window -> invisible.
    assert got == {(0, 8, 19), (1, 4, 15)}, got

    # Maximality knob: lowering n to 3 makes doc2's self-repeat
    # visible at exactly its planted intervals (tokens 1..4 and
    # 11..14), min_span_tokens permitting.
    got3 = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_span_intervals(
            docs.where(F.col("doc_id") == 2), n=3, min_span_tokens=4
        ).collect()
    }
    assert got3 == {(2, 1, 4), (2, 11, 14)}, got3


def test_remove_repeated_spans_cuts_exactly_the_intervals(spark):
    """The applied cut removes precisely the planted span's tokens
    from both docs (all occurrences — boilerplate policy), leaves the
    unique docs' text untouched, and reports per-doc removal counts.
    A doc that is ENTIRELY repeated mass comes back as ''."""
    from map_reduce_library_spark.operators.spans import (
        remove_repeated_spans,
    )

    planted = [f"shared{i}" for i in range(12)]
    doc0 = [f"a{i}" for i in range(7)] + planted + [f"z{i}" for i in range(5)]
    doc1 = [f"b{i}" for i in range(3)] + planted + [f"y{i}" for i in range(9)]
    doc2 = [f"u{i}" for i in range(8)]  # unique, untouched
    doc3 = list(planted)  # nothing but the repeated span
    docs = spark.createDataFrame(
        [(0, doc0), (1, doc1), (2, doc2), (3, doc3)],
        "doc_id bigint, toks array<string>",
    )

    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in remove_repeated_spans(docs).collect()
    }
    assert got[0] == (
        " ".join([f"a{i}" for i in range(7)] + [f"z{i}" for i in range(5)]),
        24, 12,
    ), got[0]
    assert got[1] == (
        " ".join([f"b{i}" for i in range(3)] + [f"y{i}" for i in range(9)]),
        24, 12,
    ), got[1]
    assert got[2] == (" ".join(doc2), 8, 0), got[2]
    assert got[3] == ("", 12, 12), got[3]
    assert set(got) == {0, 1, 2, 3}


def test_remove_repeated_spans_oracle(spark):
    assert_oracle_match(spark, "remove_repeated_spans")


def test_repeated_span_intervals_oracle(spark):
    assert_oracle_match(spark, "repeated_span_intervals")


def test_remove_repeated_spans_keep_first_exempts_first_occurrence(spark):
    """keep_first=True keeps the globally-first occurrence — min
    (doc_id, span_start) — of each span content and cuts the rest;
    distinct span contents are ranked independently."""
    from map_reduce_library_spark.operators.spans import (
        remove_repeated_spans,
    )

    planted = [f"shared{i}" for i in range(12)]
    other = [f"tmpl{i}" for i in range(8)]
    doc0 = [f"a{i}" for i in range(7)] + planted
    doc1 = [f"b{i}" for i in range(3)] + planted + other
    doc2 = list(other) + [f"c{i}" for i in range(4)]
    docs = spark.createDataFrame(
        [(0, doc0), (1, doc1), (2, doc2)],
        "doc_id bigint, toks array<string>",
    )

    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_repeated_spans(docs, keep_first=True).collect()
    }
    # doc0 holds the first occurrence of `planted` -> untouched
    assert got[0] == (" ".join(doc0), 0), got[0]
    # doc1's `planted` copy is cut; its `other` copy is FIRST -> kept
    assert got[1] == (
        " ".join([f"b{i}" for i in range(3)] + other), 12,
    ), got[1]
    # doc2's `other` copy is the second occurrence -> cut
    assert got[2] == (" ".join(f"c{i}" for i in range(4)), 8), got[2]


def test_remove_repeated_spans_keep_first_oracle(spark):
    assert_oracle_match(spark, "remove_repeated_spans_keep_first")
