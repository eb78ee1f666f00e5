"""Multimodal plumbing: schema, metadata pass, batched decode→feature
pipeline over the deterministic fake container; the real-codec hook
raises NotImplementedError for unknown formats."""

from __future__ import annotations

import pytest

from dedup.multimodal import (
    decode_image,
    extract_media_meta,
    fake_media_corpus,
    image_features,
    pack_fake_media,
)


def test_real_codec_hook_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not actually decodable jpeg")


def test_fake_decode_roundtrip():
    body = bytes(range(256)) * 4
    payload = pack_fake_media("image", 32, 32, body)
    pix = decode_image(payload)
    assert pix.shape == (32, 32)


def test_metadata_pass(spark):
    media = fake_media_corpus(spark, n=30)
    meta = extract_media_meta(media).collect()
    assert len(meta) == 30
    for r in meta:
        assert r["kind_parsed"] in ("image", "audio", "video")
        assert r["width"] >= 16 and r["height"] >= 16
        assert r["payload_bytes"] > 13


def test_image_feature_pipeline(spark):
    media = fake_media_corpus(spark, n=30)
    feats = image_features(media, thumb=8).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(feats) == n_images
    for r in feats:
        assert len(r["feature"]) == 64
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # determinism
    feats2 = image_features(media, thumb=8).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in feats2
    }
