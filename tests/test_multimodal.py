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


def test_decode_media_rejects_malformed_payloads():
    """decode_media is a REAL parser now (round 6): malformed bytes are
    a ValueError from format validation, not a silent fake."""
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG....", "image")       # not a P6 magic
    with pytest.raises(Exception):
        decode_media(b"RIFFxxxxWAVE", "audio")       # truncated RIFF
    with pytest.raises(ValueError):
        decode_media(b"NOPE\x00\x00\x00\x01", "video")  # bad magic
    with pytest.raises(ValueError):
        decode_media(b"junk", "hologram")            # unknown kind


def test_decode_media_roundtrips_synthesized_payloads():
    from clickhouse_aggregation_spark.operators.multimodal import (
        AUDIO_RATE, make_audio_wav, make_image_ppm, make_video_blob,
    )
    img = decode_media(make_image_ppm(33), "image")
    assert (img["width"], img["height"]) == (8 + 33 % 8, 6 + 33 % 5)
    assert img["px_sum"] == sum((33 * 31 + i * 7) % 256
                                for i in range(img["width"]
                                               * img["height"] * 3))
    aud = decode_media(make_audio_wav(250), "audio")
    assert aud["n_samples"] == 256 + 250 % 256
    assert aud["sample_rate"] == AUDIO_RATE
    assert aud["amp_sum"] == sum(abs((250 * 13 + i * 11) % 4096 - 2048)
                                 for i in range(aud["n_samples"]))
    vid = decode_media(make_video_blob(8), "video")
    assert vid["n_frames"] == 2 + (8 // 3) % 3
    assert (vid["width"], vid["height"]) == (8, 6)


def test_ppm_parser_handles_comments_and_multidigit_dims():
    """The parser implements the real Netpbm grammar, not a fixed
    offset slice: comments between header tokens and multi-digit
    dimensions must parse."""
    from clickhouse_aggregation_spark.operators.multimodal import _parse_ppm
    px = bytes(range(256)) * ((12 * 10 * 3) // 256 + 1)
    px = px[:12 * 10 * 3]
    data = b"P6\n# a comment\n12 # w\n10\n# another\n255\n" + px
    w, h, got = _parse_ppm(data)
    assert (w, h) == (12, 10)
    assert got == px
    with pytest.raises(ValueError):
        _parse_ppm(b"P6\n8 6\n255\n" + b"\x00" * 10)   # truncated pixels


def test_decode_stats_query_matches_decoder(spark, sf_dir):
    """The declared decode query: every row's stats equal a direct
    decode_media call on the synthesized payload."""
    from clickhouse_aggregation_spark.operators.multimodal import (
        q_multimodal_decode_stats, synth_media_table,
    )
    stats = {r["media_id"]: r for r in
             q_multimodal_decode_stats(spark, sf_dir).collect()}
    src = synth_media_table(spark, sf_dir).collect()
    assert len(stats) == len(src) > 0
    for row in src[:60]:
        b = bytes(row["payload"])
        d = decode_media(b, row["kind"])
        s = stats[row["media_id"]]
        assert s["n_bytes"] == len(b)
        for k, v in d.items():
            assert s[k] == v, (row["media_id"], k)


def test_decode_audit_quarantines_and_counts(spark, sf_dir):
    """Error capture must quarantine exactly the corrupted items and
    decode everything else; totals tie out to the corpus."""
    from pyspark.sql import functions as F

    from clickhouse_aggregation_spark.operators.multimodal import (
        CORRUPT_MOD, q_multimodal_decode_audit,
    )
    from clickhouse_aggregation_spark.sources.tables import load_table
    rows = {r["kind"]: r for r in
            q_multimodal_decode_audit(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_ok"] + r["n_quarantined"] for r in rows.values()) \
        == n_docs
    n_corrupt = docs.filter(F.col("doc_id") % CORRUPT_MOD == 0).count()
    assert sum(r["n_quarantined"] for r in rows.values()) == n_corrupt
    assert all(r["n_ok"] > 0 for r in rows.values())
    # the surfaced triage column: every corrupted payload is a 3-byte
    # truncation, so the representative error type per kind is fixed
    for kind, r in rows.items():
        expected = "EOFError" if kind == "audio" else "ValueError"
        assert r["first_err"] == (expected if r["n_quarantined"] > 0
                                  else None)
