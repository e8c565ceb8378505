"""Multimodal plumbing: oracle checks + batch-shape/stub behavior."""

import pytest
from conftest import SF_SMOKE, assert_oracle_match

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


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"\x89PNG...")
