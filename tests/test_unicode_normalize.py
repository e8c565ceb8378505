"""Ingest-time unicode normalization (operators/text.py::
unicode_normalize): the Arrow stage normalize_for_dedup's docstring
delegates NFC handling to. Ground truth is Python's unicodedata
directly — independent of the Spark path under test."""

import unicodedata

import pytest

from map_reduce_library_spark.operators.text import unicode_normalize

NFC_WORD = "café"  # é composed (U+00E9)
NFD_WORD = "café"  # e + combining acute (U+0301)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, f"the {NFC_WORD} on the corner", "web"),
            (2, f"the {NFD_WORD} on the corner", "web"),
            (3, None, "pdf"),
            (4, "ﬁle system", "web"),  # ﬁ ligature (NFKC-only)
        ],
        "doc_id bigint, text string, source string",
    )


def test_nfc_unifies_composed_and_decomposed(spark, docs):
    assert NFC_WORD != NFD_WORD  # raw bytes differ — the gap is real
    out = {r.doc_id: r.text for r in unicode_normalize(docs).collect()}
    assert out[1] == out[2] == f"the {NFC_WORD} on the corner"
    # matches unicodedata ground truth exactly
    assert out[2] == unicodedata.normalize("NFC", f"the {NFD_WORD} on the corner")
    # NFC leaves compatibility ligatures alone; NFKC folds them
    assert out[4].startswith("ﬁ")
    nfkc = {r.doc_id: r.text for r in unicode_normalize(docs, form="NFKC").collect()}
    assert nfkc[4] == "file system"


def test_schema_nulls_and_other_columns_preserved(spark, docs):
    out = unicode_normalize(docs)
    assert out.schema == docs.schema
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[3].text is None
    assert {r.source for r in rows.values()} == {"web", "pdf"}
    assert set(rows) == {1, 2, 3, 4}


def test_downstream_dedup_unifies_after_normalization(spark, docs):
    """The motivating pipeline: exact fingerprints differ on raw
    NFC/NFD variants, unify after the ingest pass."""
    from map_reduce_library_spark.operators.text import doc_fingerprints

    variants = docs.where("doc_id in (1, 2)")
    raw = {r.doc_id: r.fp_exact for r in doc_fingerprints(variants).collect()}
    assert raw[1] != raw[2]
    canon = {
        r.doc_id: r.fp_exact
        for r in doc_fingerprints(unicode_normalize(variants)).collect()
    }
    assert canon[1] == canon[2]


# Curated hard cases: combining marks (single + stacked), Hangul
# jamo composition, ligatures and full-width forms (NFC-invariant,
# NFKC-folded), astral-plane text, and the empty string.
BATTERY = [
    "é",  # e + combining acute -> é
    "ȩ́",  # stacked combining marks (acute + cedilla)
    "각",  # Hangul jamo -> 각 (composed syllable)
    "ﬃ ㎒ ２４",  # ligature / squared unit / full-width digits
    "\U0001f600 \U00010400",  # astral plane (emoji, Deseret)
    "",  # empty string
    "already ascii",
]


def test_battery_matches_unicodedata_for_every_form(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(BATTERY)], "doc_id bigint, text string"
    )
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {
            r.doc_id: r.text
            for r in unicode_normalize(df, form=form).collect()
        }
        for i, s in enumerate(BATTERY):
            assert got[i] == unicodedata.normalize(form, s), (form, s)
        # idempotence: a normalized corpus re-normalizes to itself
        twice = {
            r.doc_id: r.text
            for r in unicode_normalize(
                unicode_normalize(df, form=form), form=form
            ).collect()
        }
        assert twice == got, form


def test_bad_arguments_raise_eagerly(spark, docs):
    with pytest.raises(ValueError, match="form"):
        unicode_normalize(docs, form="NFX")
    with pytest.raises(ValueError, match="no column"):
        unicode_normalize(docs, text_col="body")
    with pytest.raises(ValueError, match="must be string"):
        unicode_normalize(docs, text_col="doc_id")
