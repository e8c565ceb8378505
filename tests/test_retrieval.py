"""RRF fusion semantics, hand-checked on synthetic rankings."""

from __future__ import annotations

import pytest

from map_reduce_library_spark.operators.retrieval import ranked, rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, rnk int")


def test_rrf_hand_computed(spark):
    """Doc in both lists at mid ranks beats docs that top one list:
    1/(60+2)+1/(60+3) > 1/(60+1). The defining RRF behavior."""
    lex = _ranking(spark, [(10, 1), (20, 2), (30, 3)])
    sem = _ranking(spark, [(40, 1), (30, 2), (20, 3)])
    got = rrf_fuse({"lex": lex, "sem": sem}, top_k=5).collect()
    order = [r.doc_id for r in got]
    # 20: 1/62+1/63 ≈ .032; 30: 1/63+1/62 same; 10: 1/61; 40: 1/61
    assert order == [20, 30, 10, 40]
    by_id = {r.doc_id: r for r in got}
    assert by_id[20].rrf_score == pytest.approx(
        round(1 / 62 + 1 / 63, 9), abs=0
    )
    assert by_id[10].lex_rnk == 1 and by_id[10].sem_rnk is None
    assert by_id[40].lex_rnk is None and by_id[40].sem_rnk == 1


def test_rrf_ties_break_by_doc_id(spark):
    lex = _ranking(spark, [(7, 1), (3, 2)])
    sem = _ranking(spark, [(3, 1), (7, 2)])
    got = [r.doc_id for r in rrf_fuse({"lex": lex, "sem": sem}, top_k=2).collect()]
    assert got == [3, 7]  # identical scores -> id ascending


def test_ranked_orders_desc_then_id(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 5.0)], "doc_id bigint, score double"
    )
    got = {r.doc_id: r.rnk for r in ranked(df, "score").collect()}
    assert got == {2: 1, 1: 2, 3: 3}
