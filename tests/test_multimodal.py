"""Pin the Pandas-UDF feature extractor against a pure-Python reference
(no SQL oracle exists for the mapInPandas path)."""

from __future__ import annotations

import pytest

from hadoop_cs4225_spark.functions.multimodal import (
    FRAME_BYTES,
    decode_media,
    extract_media_features,
    media_from_documents,
)
from hadoop_cs4225_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _ref_hist(payload: bytes, n_bins: int = 16) -> list[int]:
    hist = [0] * n_bins
    for b in payload:
        hist[b * n_bins // 256] += 1
    return hist


def test_features_match_python_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents").where("doc_id <= 20")
    media = media_from_documents(docs)
    feats = {
        r.doc_id: r for r in extract_media_features(media).collect()
    }
    for row in docs.collect():
        payload = row.text.encode("utf-8")
        f = feats[row.doc_id]
        assert f.content_len == len(payload)
        assert list(f.byte_hist) == _ref_hist(payload)
        assert f.n_frames == -(-len(payload) // FRAME_BYTES)
        assert f.media_type in ("image", "audio", "video")


def test_row_preservation_and_schema(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    media = media_from_documents(docs)
    feats = extract_media_features(media)
    assert feats.count() == docs.count()
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "media_type", "content_len", "byte_hist", "n_frames",
    ]


def test_decode_stub_rejects_real_media():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "image")
    assert decode_media(b"plain text payload", "image") == b"plain text payload"


def test_arrow_and_pandas_feature_paths_identical(spark):
    """mapInArrow and mapInPandas extractors must agree bit-for-bit."""
    from hadoop_cs4225_spark import registry

    registry.load_all()
    a = registry.QUERIES["media_byte_features"](spark, SF_SMOKE).collect()
    b = registry.QUERIES["media_byte_features_arrow"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
