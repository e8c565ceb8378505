"""Property test: the declarative BPE learner (fold-based merge,
LIMIT-1 winner relation) against an independent pure-Python reference
implementation of textbook BPE (dict counting, scan-with-lookahead
merge). Small alphabets force heavy tie-breaking, which is where two
implementations of 'count desc, then lexicographic (l, r)' and
'greedy non-overlapping left-to-right' diverge if either is wrong."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_library_spark.operators.bpe import END_OF_WORD, bpe_learn

N_ROUNDS = 3

words_strategy = st.dictionaries(
    keys=st.text(alphabet="abc", min_size=1, max_size=6),
    values=st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=8,
)


def _py_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_bpe(word_counts: dict[str, int], n: int):
    tabs = {w: tuple(list(w) + [END_OF_WORD]) for w in word_counts}
    merges = []
    for _ in range(n):
        pc: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            syms = tabs[w]
            for pair in zip(syms, syms[1:]):
                pc[pair] = pc.get(pair, 0) + c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        tabs = {w: _py_apply(s, left, right) for w, s in tabs.items()}
    return merges


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(word_counts=words_strategy)
def test_bpe_learn_matches_python_reference(spark, word_counts):
    text = " ".join(w for w, c in word_counts.items() for _ in range(c))
    docs = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    want = _py_bpe(word_counts, N_ROUNDS)
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn(docs, N_ROUNDS).orderBy("step").collect()
    ]
    # both implementations stop emitting when no pairs remain (every
    # word collapsed to a single symbol), so the lists match exactly
    assert got == want


def test_bpe_segment_200_merges_flat_plan(spark):
    """Realistic-vocab segmentation (VERDICT r5 item 5): apply 200+
    learned merges through the Arrow mapInPandas segmenter. The old
    per-merge unrolled fold chain exploded Catalyst analysis at this
    depth; now the plan must stay FLAT (one MapInPandas node, no
    aggregate() folds) and the output must equal the pure-Python
    sequential greedy application merge-for-merge."""
    import random

    rnd = random.Random(7)
    word_counts: dict[str, int] = {}
    for _ in range(60):
        w = "".join(rnd.choice("abcdef") for _ in range(rnd.randint(4, 12)))
        word_counts[w] = word_counts.get(w, 0) + rnd.randint(1, 4)
    merges = _py_bpe(word_counts, 258)
    assert len(merges) >= 200

    from map_reduce_library_spark.operators.bpe import bpe_segment

    text = " ".join(w for w, c in word_counts.items() for _ in range(c))
    docs = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    merges_df = spark.createDataFrame(
        [(i + 1, l, r) for i, (l, r, _) in enumerate(merges)],
        "step int, left_sym string, right_sym string",
    )
    seg = bpe_segment(docs, merges_df)

    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "aggregate(" not in plan
    assert "BatchEvalPython" not in plan

    want: dict[str, tuple[str, ...]] = {}
    for w in word_counts:
        syms = tuple(list(w) + [END_OF_WORD])
        for left, right, _ in merges:
            syms = _py_apply(syms, left, right)
        want[w] = syms
    got = {r.token: tuple(r.syms) for r in seg.collect()}
    assert got == want
