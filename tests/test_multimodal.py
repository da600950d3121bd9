"""Unit tests for the multimodal plumbing: the mapInPandas feature
stage must agree with a pure-Python reference, and the decode stub must
be explicit about unavailability."""

from __future__ import annotations

import pytest

from clickhouse_aggregation_spark.operators.multimodal import (
    decode_media, media_table, q_multimodal_feature_extract,
)


def test_feature_extract_matches_python_reference(spark, sf_dir):
    feats = {r["media_id"]: r for r in
             q_multimodal_feature_extract(spark, sf_dir).collect()}
    src = media_table(spark, sf_dir).collect()
    assert len(feats) == len(src) > 0
    for row in src[:50]:
        b = bytes(row["payload"])
        f = feats[row["media_id"]]
        assert f["n_bytes"] == len(b)
        assert f["header_u32"] == int.from_bytes(b[:4], "big")
        assert f["low_byte_ratio"] == pytest.approx(
            sum(1 for x in b if x < 0x70) / len(b))
        assert f["kind"] in ("image", "audio", "video")


def test_decode_media_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF", "audio")
