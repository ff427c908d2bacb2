"""Multimodal plumbing: payload schema, mapInPandas batch shape, stubs."""

from __future__ import annotations

import hashlib

import pytest

from pmp_analytics_spark.multimodal import (
    attach_payload,
    decode_audio,
    decode_image,
    extract_payload_features,
    fake_frame_sample,
)
from pmp_analytics_spark.sources.reader import load_table


def test_payload_schema_and_features(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wp = attach_payload(docs)
    assert dict(wp.dtypes)["payload"] == "binary"
    assert "struct" in dict(wp.dtypes)["meta"]

    feats = extract_payload_features(wp)
    rows = {r["doc_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows.keys() == src.keys()
    some = next(iter(rows))
    raw = src[some].encode("utf-8")
    assert rows[some]["n_bytes"] == len(raw)
    assert rows[some]["payload_md5"] == hashlib.md5(raw).hexdigest()
    assert rows[some]["header_hex"] == raw[:8].hex()
    assert rows[some]["content_type"] in ("image/fake", "audio/fake")


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_fake_frame_sample_deterministic():
    payload = bytes(range(100))
    frames = fake_frame_sample(payload, n_frames=4)
    assert len(frames) == 4
    assert frames == fake_frame_sample(payload, n_frames=4)
    assert all(len(f) == 25 for f in frames)
    assert fake_frame_sample(b"", 4) == []


def test_resize_stub_raises():
    from pmp_analytics_spark.multimodal import resize_image

    with pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG", 64, 64)


def test_sample_frames_fanout(spark):
    import hashlib as _hl

    from pmp_analytics_spark.multimodal import attach_payload, sample_frames

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "xyz"), (3, "")], ["doc_id", "text"]
    )
    rows = sample_frames(attach_payload(docs), n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 bytes -> 4 frames of 25; 3 bytes -> step 1, frames of 1,1,1 and
    # one empty; empty payload -> no rows at all.
    assert len(by_doc[1]) == 4
    assert all(r["frame_bytes"] == 25 for r in by_doc[1])
    assert by_doc[1][0]["frame_md5"] == _hl.md5(b"a" * 25).hexdigest()
    assert len(by_doc[2]) == 4
    assert sorted(r["frame_bytes"] for r in by_doc[2]) == [0, 1, 1, 1]
    assert 3 not in by_doc
