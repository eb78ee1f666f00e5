"""Multimodal plumbing: schema, metadata pass, batched decode→feature
pipelines. Uncompressed containers (24-bit BMP, RIFF/WAVE PCM-16)
decode for REAL via pure-struct codecs; compressed formats raise the
documented NotImplementedError hook."""

from __future__ import annotations

import numpy as np
import pytest

from dedup.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    extract_media_meta,
    fake_media_corpus,
    image_features,
    pack_bmp,
    pack_fake_media,
    pack_wav,
    real_media_corpus,
)


def test_compressed_codec_hook_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not actually decodable jpeg")
    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS not actually decodable vorbis")


def test_bmp_roundtrip_bit_exact():
    rng = np.random.default_rng(3)
    for w in (16, 17, 33):  # odd widths exercise the 4-byte row padding
        pix = rng.integers(0, 256, (21, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(pack_bmp(pix)), pix)
    gray = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    assert np.array_equal(
        decode_image(pack_bmp(gray)), np.repeat(gray[:, :, None], 3, axis=2)
    )


def test_bmp_unsupported_depth_raises():
    bad = bytearray(pack_bmp(np.zeros((4, 4), dtype=np.uint8)))
    bad[28] = 8  # bpp 24 → 8
    with pytest.raises(NotImplementedError):
        decode_image(bytes(bad))


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(4)
    for ch in (1, 2):
        pcm = rng.integers(-32768, 32768, (777, ch)).astype(np.int16)
        frames, rate = decode_audio(pack_wav(pcm, 44100))
        assert rate == 44100
        assert np.array_equal(frames, pcm)


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


def test_real_container_metadata_pass(spark):
    """Header-only probe over REAL BMP/WAV bytes: dims and audio params
    come back exactly as packed, without decoding any frames."""
    media = real_media_corpus(spark, n=20)
    meta = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    declared = {r["media_id"]: r for r in media.select(
        "media_id", "kind", "meta").collect()}
    assert len(meta) == 20
    for mid, r in meta.items():
        d = declared[mid]
        assert r["kind_parsed"] == d["kind"]
        if d["kind"] == "image":
            assert (r["width"], r["height"]) == (
                d["meta"]["width"], d["meta"]["height"]
            )
        else:
            assert r["sample_rate"] == d["meta"]["sample_rate"]
            assert r["n_frames"] == d["meta"]["n_frames"]


def test_real_image_features_match_local(spark):
    """Distributed decode→feature over real BMPs == the same numpy
    pipeline run locally on the source pixel arrays."""
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    from dedup.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [(0, "image", bytearray(pack_bmp(pix)), (31, 24, None, None))],
        MEDIA_SCHEMA,
    )
    (row,) = image_features(media, thumb=8).collect()
    luma = pix.mean(axis=2)
    ys = np.linspace(0, 23, 8).astype(int)
    xs = np.linspace(0, 30, 8).astype(int)
    want = (luma[np.ix_(ys, xs)].astype(np.float32) / 255.0).ravel()
    assert np.allclose(row["feature"], want)


def test_real_audio_features(spark):
    """RMS windows over real WAV PCM: a loud half and a silent half
    produce high-then-zero window energies, and counts round-trip."""
    rate, n = 16000, 1600
    loud = (np.sin(np.linspace(0, 40 * np.pi, n // 2)) * 20000).astype(
        np.int16
    )
    pcm = np.concatenate([loud, np.zeros(n // 2, dtype=np.int16)])
    from dedup.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [(0, "audio", bytearray(pack_wav(pcm, rate)),
          (None, None, rate, n))],
        MEDIA_SCHEMA,
    )
    (row,) = audio_features(media, n_windows=4).collect()
    assert row["sample_rate"] == rate and row["n_samples"] == n
    rms = row["rms"]
    assert len(rms) == 4
    assert rms[0] > 0.3 and rms[1] > 0.3   # loud half
    assert rms[2] == 0.0 and rms[3] == 0.0  # silent half
    # compressed payloads are skipped, not fatal
    bad = spark.createDataFrame(
        [(1, "audio", bytearray(b"OggS opus bytes"), (None,) * 4)],
        MEDIA_SCHEMA,
    )
    assert audio_features(bad).count() == 0


def test_video_frame_sample(spark):
    """Uniform frame sampling over the raw-frame container: 10 packed
    frames sampled to 4 → indices 0,3,6,9 of the source stack; feature
    rows match the local per-frame thumbnail pipeline."""
    from dedup.multimodal import (
        MEDIA_SCHEMA,
        decode_video_frames,
        video_frame_features,
    )

    rng = np.random.default_rng(5)
    w, h, nf = 20, 12, 10
    frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
    payload = pack_fake_media("video", w, h, frames.tobytes())
    picked = decode_video_frames(payload, n_frames=4)
    assert np.array_equal(picked, frames[[0, 3, 6, 9]])

    media = spark.createDataFrame(
        [(0, "video", bytearray(payload), (w, h, None, nf)),
         (1, "video", bytearray(b"\x00\x00\x01\xba mpeg-ps"), (None,) * 4)],
        MEDIA_SCHEMA,
    )
    rows = video_frame_features(media, n_sample=4, thumb=8).collect()
    assert len(rows) == 4  # compressed payload skipped, not fatal
    ys = np.linspace(0, h - 1, 8).astype(int)
    xs = np.linspace(0, w - 1, 8).astype(int)
    for r in rows:
        want = (frames[[0, 3, 6, 9][r["frame_idx"]]][np.ix_(ys, xs)]
                .astype(np.float32) / 255.0).ravel()
        assert np.allclose(r["feature"], want)


def test_corrupt_headers_never_kill_scans(spark):
    """The review adversary: zero-dim BMP/fake headers and an
    out-of-range fake kind byte must yield null metadata and zero
    feature rows — never a task failure."""
    import struct as _struct

    from dedup.multimodal import MEDIA_SCHEMA, video_frame_features

    zero_w_bmp = bytearray(pack_bmp(np.zeros((4, 4), dtype=np.uint8)))
    _struct.pack_into("<i", zero_w_bmp, 18, 0)  # width := 0
    zero_dim_fake = pack_fake_media("image", 0, 7, b"xx")
    bad_kind = bytearray(pack_fake_media("image", 4, 4, b"body"))
    bad_kind[4] = 7
    rows = [
        (0, "image", zero_w_bmp, (None,) * 4),
        (1, "image", bytearray(zero_dim_fake), (None,) * 4),
        (2, "image", bytes(bad_kind), (None,) * 4),
        (3, "audio", bytes(bad_kind), (None,) * 4),
        (4, "video", bytes(bad_kind), (None,) * 4),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    meta = extract_media_meta(media).collect()
    assert len(meta) == 5  # the scan survives every row
    by_id = {r["media_id"]: r for r in meta}
    assert by_id[2]["kind_parsed"] is None  # kind byte 7 → unparseable
    assert image_features(media).count() == 0
    assert audio_features(media).count() == 0
    assert video_frame_features(media).count() == 0


def test_avi_roundtrip_bit_exact():
    """pack_avi → _decode_avi is the identity on RGB frame stacks —
    including widths whose 3-byte rows need DIB 4-byte padding — and
    grayscale input replicates to RGB exactly like pack_bmp."""
    from dedup.multimodal import _decode_avi, pack_avi

    rng = np.random.default_rng(23)
    for w, h, nf in [(16, 12, 3), (17, 9, 5), (1, 1, 2), (33, 7, 1)]:
        vid = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
        assert np.array_equal(_decode_avi(pack_avi(vid)), vid), (w, h, nf)
    gray = rng.integers(0, 256, (4, 10, 13), dtype=np.uint8)
    got = _decode_avi(pack_avi(gray))
    assert np.array_equal(got, np.repeat(gray[:, :, :, None], 3, axis=3))


def test_avi_decode_is_total_on_corrupt_payloads():
    """Truncated containers, lying strf depth, and empty movi must
    raise the documented error types (callers catch them per-row) —
    never crash with an unrelated exception or return garbage."""
    import struct as _struct

    import pytest as _pytest

    from dedup.multimodal import _decode_avi, decode_video_frames, pack_avi

    rng = np.random.default_rng(29)
    vid = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    good = pack_avi(vid)

    # truncation at every prefix must raise ValueError/NotImplementedError
    for cut in (10, 40, 120, len(good) - 50):
        with _pytest.raises((ValueError, NotImplementedError)):
            _decode_avi(good[:cut])

    # lying strf: claim 8-bit frames → explicit NotImplementedError
    bad_bpp = bytearray(good)
    strf_off = bytes(good).index(b"strf") + 8
    _struct.pack_into("<H", bad_bpp, strf_off + 14, 8)
    with _pytest.raises(NotImplementedError):
        _decode_avi(bytes(bad_bpp))

    # non-AVI RIFF reaches the fake/compressed dispatch, not the codec
    with _pytest.raises(NotImplementedError):
        decode_video_frames(b"RIFF\x00\x00\x00\x00ELMO")


def test_real_avi_video_features(spark):
    """video_frame_features over REAL AVI bytes end-to-end: sampled
    luma thumbnails match the local numpy pipeline on the source
    frames, and the header-only probe reports dims + frame count."""
    from dedup.multimodal import (
        MEDIA_SCHEMA,
        pack_avi,
        video_frame_features,
    )

    rng = np.random.default_rng(31)
    w, h, nf = 20, 12, 10
    vid = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, "video", bytearray(pack_avi(vid)), (w, h, None, nf))],
        MEDIA_SCHEMA,
    )
    meta = extract_media_meta(media).collect()[0]
    assert (meta["kind_parsed"], meta["width"], meta["height"],
            meta["n_frames"]) == ("video", w, h, nf)

    rows = video_frame_features(media, n_sample=4, thumb=8).collect()
    assert len(rows) == 4
    ys = np.linspace(0, h - 1, 8).astype(int)
    xs = np.linspace(0, w - 1, 8).astype(int)
    for r in rows:
        src = vid[[0, 3, 6, 9][r["frame_idx"]]].mean(axis=2)
        want = (src[np.ix_(ys, xs)].astype(np.float32) / 255.0).ravel()
        assert np.allclose(r["feature"], want)


def test_media_channel_clusters_identical_images_through_gates(spark):
    """VERDICT r4 #7 e2e: two pages carrying the SAME image but
    completely different text (sub-threshold Jaccard) cluster via the
    media channel; an equally-identical image pair sharing a source is
    still gated by the reason stack (noSameLOWTags) — media evidence
    proposes, the gates dispose."""
    import datetime

    from dedup.config import DedupConfig
    from dedup.multimodal import media_dup_pairs, pack_avi, pack_bmp
    from dedup.pipeline import run_dedup
    from dedup.schema import PAGES_SCHEMA, SOURCES_SCHEMA

    rng = np.random.default_rng(41)
    img1 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    vocabs = [
        "alpha bravo charlie delta echo foxtrot",
        "golf hotel india juliet kilo lima",
        "mike november oscar papa quebec romeo",
        "sierra tango uniform victor whiskey xray",
    ]

    ts = datetime.datetime(2024, 6, 1)

    def page(url, vocab):
        words = vocab.split()
        text = " ".join(words[i] for i in rng.integers(0, len(words), 200))
        return (url, ts, b"<html>", text, "en", [], [], [], ["h"], None)

    a, b = "https://m/a", "https://m/b"
    c, d = "https://m/c", "https://m/d"
    pages = spark.createDataFrame(
        [page(a, vocabs[0]), page(b, vocabs[1]),
         page(c, vocabs[2]), page(d, vocabs[3])],
        PAGES_SCHEMA,
    )
    # a & b carry img1 (different sources); c & d carry img2 (SAME
    # source) — identical thumbnail evidence, opposite gate outcomes
    media = spark.createDataFrame(
        [(a, bytearray(pack_bmp(img1))), (b, bytearray(pack_bmp(img1))),
         (c, bytearray(pack_bmp(img2))), (d, bytearray(pack_bmp(img2)))],
        "url string, payload binary",
    )
    sources = spark.createDataFrame(
        [(a, "s1", None), (b, "s2", None),
         (c, "s3", None), (d, "s3", None)],
        SOURCES_SCHEMA,
    )

    cfg = DedupConfig()
    pairs, hot = media_dup_pairs(media, cfg)
    got_pairs = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert got_pairs == {(a, b), (c, d)}
    assert hot.count() == 0

    res = run_dedup(
        pages, cfg, sources=sources, bypass_jaccard_channels=[pairs]
    )
    assign = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    assert assign[a] == assign[b]        # media evidence merged a & b
    assert assign[c] != assign[d]        # source overlap gated c & d
    edges = {(r["url_a"], r["url_b"]) for r in res.edges.collect()}
    assert (c, d) not in edges and (d, c) not in edges
    res.release()

    # the gate fires with the verbatim reference reason (same stack the
    # bypass channel runs inside run_dedup)
    from dedup.normalize import with_normalized
    from dedup.verify import attach_features, pair_reasons, url_features

    feats = url_features(with_normalized(pages), sources)
    gated = {
        (r["url_a"], r["url_b"]): r["reasons"]
        for r in pair_reasons(attach_features(pairs, feats), cfg)
        .select("url_a", "url_b", "reasons").collect()
    }
    assert "Both records have have LOW tag: s3" in gated[(c, d)]
    assert not gated[(a, b)]  # nothing objects to the merged pair

    # a video payload keys nothing (image channel) — skipped, not fatal
    vid_media = spark.createDataFrame(
        [(a, bytearray(pack_avi(rng.integers(0, 256, (2, 8, 8, 3),
                                             dtype=np.uint8))))],
        "url string, payload binary",
    )
    vpairs, _ = media_dup_pairs(vid_media, cfg)
    assert vpairs.count() == 0
