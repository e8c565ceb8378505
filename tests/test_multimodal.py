"""Multimodal plumbing: oracle checks + batch-shape/stub behavior."""

import pytest
from conftest import SF_CORRECTNESS, SF_SMOKE, assert_oracle_match

from map_reduce_library_spark.operators.multimodal import (
    decode_image,
    sample_frames,
    with_binary_payload,
)


@pytest.mark.parametrize(
    "name",
    [
        "multimodal_meta",
        "multimodal_features",
        "multimodal_frames",
        "multimodal_resize",
    ],
)
def test_multimodal_oracle(spark, name):
    assert_oracle_match(spark, name)


def test_binary_payload_schema(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    b = with_binary_payload(docs)
    assert dict(b.dtypes)["payload"] == "binary"
    assert b.schema["meta"].dataType.typeName() == "struct"
    row = b.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)


def test_frame_sampling_fanout(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(10)
    frames = sample_frames(with_binary_payload(docs), every=64, max_frames=8)
    rows = frames.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert isinstance(r.frame, (bytes, bytearray))
        assert len(r.frame) == 1
    for doc_rows in by_doc.values():
        idxs = sorted(r.frame_idx for r in doc_rows)
        assert idxs == list(range(len(idxs)))  # contiguous frame idxs
        assert len(idxs) <= 8


def test_decode_unknown_magic_raises():
    # a corrupt PNG signature is an unknown magic now that every
    # supported format (PNG/netpbm/JPEG) decodes for real
    with pytest.raises(ValueError, match="unknown image magic"):
        decode_image(b"\x89PNG...")


def test_corpus_payload_is_ascii_so_byte_and_char_strides_agree(spark):
    """resize_images strides payload BYTES while the multimodal_resize
    oracle strides text CHARACTERS — the two agree only while the
    documents corpus is pure ASCII (1 byte == 1 char). Pin that
    assumption (ADVICE r4): octet_length(utf8 text) must equal
    character length for every document, at both the smoke and the
    correctness SF. If the generator ever emits non-ASCII text, this
    fails loudly instead of the oracle silently diverging."""
    from pyspark.sql import functions as F

    for sf in (SF_SMOKE, SF_CORRECTNESS):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        non_ascii = docs.where(
            F.octet_length("text") != F.length("text")
        ).count()
        assert non_ascii == 0, (
            f"{sf}: {non_ascii} non-ASCII documents - byte-stride "
            "resize_images no longer matches the char-stride oracle"
        )


def test_null_payloads_do_not_crash_the_scan(spark):
    """code-review r8 (verified): a NULL payload used to TypeError the
    whole job in every mapInPandas stage. One corrupt row must yield
    NULL outputs (or zero frames), never kill a 100-TB scan."""
    from map_reduce_library_spark.operators.multimodal import (
        extract_binary_meta,
        extract_features,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, None), (2, b"abcdef")],
        "doc_id bigint, payload binary",
    )
    meta = {r.doc_id: r for r in extract_binary_meta(df).collect()}
    assert meta[1].n_bytes is None and meta[2].n_bytes == 6

    feats = {r.doc_id: r.features for r in extract_features(df).collect()}
    assert feats[1] is None and feats[2][0] == 6.0

    frames = sample_frames(df, every=2, max_frames=2).collect()
    assert {r.doc_id for r in frames} == {2}

    rz = {r.doc_id: r for r in resize_images(df).collect()}
    assert rz[1].resized is None and rz[1].orig_len is None
    assert rz[2].orig_len == 6
