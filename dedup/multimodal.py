"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (training-data pipeline component).

The Spark-side plumbing is real and tested: schemas, partition-friendly
batch shapes, mapInPandas signatures, metadata extraction from container
headers. Decode is REAL for uncompressed containers — BMP (24-bit
BI_RGB) images and RIFF/WAVE PCM-16 audio are parsed with pure
`struct`, no external codec — so the decode → feature pipelines run
against true bytes end-to-end. Compressed codecs (JPEG/PNG/Opus/H.264)
stay behind clearly-marked NotImplementedError hooks — those libraries
are not in this container — with a deterministic fake container also
supported so tests can exercise arbitrary dims cheaply.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("payload", T.BinaryType(), True), # opaque container
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
        ]), True),
    ]
)

# deterministic fake container: b"FAKE" + kind byte + packed dims + body
_MAGIC = b"FAKE"


def pack_fake_media(kind: str, width: int, height: int, body: bytes) -> bytes:
    k = {"image": 0, "audio": 1, "video": 2}[kind]
    return _MAGIC + bytes([k]) + struct.pack("<II", width, height) + body


def _parse_header(payload: bytes) -> tuple[str, int, int] | None:
    if payload is None or len(payload) < 13 or payload[:4] != _MAGIC:
        return None
    if payload[4] > 2:  # corrupt kind byte: unparseable, not an error
        return None
    kind = ["image", "audio", "video"][payload[4]]
    w, h = struct.unpack("<II", payload[5:13])
    return kind, w, h


# ---------------------------------------------------------------------------
# real uncompressed-container codecs (pure struct — no external libs)
# ---------------------------------------------------------------------------


def pack_bmp(pix: np.ndarray) -> bytes:
    """Write a standard 24-bit BI_RGB bottom-up BMP. Accepts (h, w)
    grayscale (replicated to RGB) or (h, w, 3) RGB uint8."""
    pix = np.asarray(pix, dtype=np.uint8)
    if pix.ndim == 2:
        pix = np.repeat(pix[:, :, None], 3, axis=2)
    h, w, _ = pix.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    # BMP stores rows bottom-up in BGR order, each row padded to 4 bytes
    bgr = pix[::-1, :, ::-1]
    rows = np.zeros((h, row_raw + pad), dtype=np.uint8)
    rows[:, :row_raw] = bgr.reshape(h, row_raw)
    body = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + dib + body


def _decode_bmp(payload: bytes) -> np.ndarray:
    off, = struct.unpack_from("<I", payload, 10)
    dib_size, w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP decode supports uncompressed 24-bit BI_RGB only "
            f"(got bpp={bpp}, compression={comp}); compressed formats "
            "need a real codec on the cluster image"
        )
    if w <= 0 or h_signed == 0:  # lying header: zero/negative dims
        raise ValueError(f"corrupt BMP dims {w}x{h_signed}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the standard layout)
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def pack_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Write a canonical RIFF/WAVE PCM-16 container. Accepts (n,) mono
    or (n, ch) int16."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _wav_chunks(payload: bytes) -> dict[bytes, tuple[int, int]]:
    """Header-only RIFF chunk scan → {id: (offset, size)} — no frame
    decode, so the metadata pass stays O(header) per row."""
    out: dict[bytes, tuple[int, int]] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        out[cid] = (pos + 8, size)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return out


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    chunks = _wav_chunks(payload)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise NotImplementedError("malformed RIFF/WAVE: missing fmt/data")
    fo, _ = chunks[b"fmt "]
    audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
        "<HHIIHH", payload, fo
    )
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV decode supports PCM-16 only (got format={audio_fmt}, "
            f"bits={bits}); compressed audio needs a real codec"
        )
    do, dsize = chunks[b"data"]
    frames = np.frombuffer(payload, dtype="<i2",
                           count=dsize // 2, offset=do)
    return frames.reshape(-1, ch), rate


def pack_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Write a standard uncompressed RIFF/AVI: 'vids'/'DIB ' stream of
    24-bit BI_RGB frames ('00db' chunks, bottom-up BGR rows padded to 4
    bytes — the same DIB layout pack_bmp writes). Accepts (n, h, w)
    grayscale (replicated to RGB) or (n, h, w, 3) RGB uint8. Pure
    struct+numpy, same bar as pack_bmp/pack_wav."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = np.repeat(frames[:, :, :, None], 3, axis=3)
    n, h, w, _ = frames.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError(f"cannot pack empty AVI ({n} frames {w}x{h})")
    stride = (w * 3 + 3) & ~3
    size_image = stride * h

    avih = struct.pack(
        "<14I", 1_000_000 // max(fps, 1), size_image * fps, 0, 0x10,
        n, 0, 1, size_image, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, n, size_image, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0
    )
    strl = (b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
            + b"strl"
            + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    hdrl = (b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
            + b"hdrl"
            + b"avih" + struct.pack("<I", len(avih)) + avih
            + strl)

    movi_body = bytearray(b"movi")
    rows = np.zeros((h, stride), dtype=np.uint8)
    for f in frames:
        bgr = f[::-1, :, ::-1]
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_body += b"00db" + struct.pack("<I", size_image)
        movi_body += rows.tobytes()
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)

    payload = hdrl + movi
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"AVI " + payload


def _riff_walk(payload: bytes, pos: int, end: int):
    """Yield (chunk_id, data_offset, data_size) over one RIFF chunk
    level; word-aligned like _wav_chunks. A size field pointing past
    the buffer stops the walk (truncated container → whatever parsed
    so far, callers validate completeness)."""
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > end:
            return
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def _decode_avi(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit DIB RIFF/AVI → (n, h, w, 3) RGB
    uint8. Pure struct+numpy; compressed streams raise
    NotImplementedError, malformed/truncated containers ValueError."""
    w = h = None
    bpp = comp = None
    frame_locs: list[tuple[int, int]] = []
    for cid, off, size in _riff_walk(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        ltype = payload[off:off + 4]
        if ltype == b"hdrl":
            for cid2, off2, size2 in _riff_walk(
                payload, off + 4, off + size
            ):
                if cid2 == b"avih" and size2 >= 56:
                    vals = struct.unpack_from("<14I", payload, off2)
                    w, h = int(vals[8]), int(vals[9])
                elif cid2 == b"LIST" \
                        and payload[off2:off2 + 4] == b"strl":
                    for cid3, off3, size3 in _riff_walk(
                        payload, off2 + 4, off2 + size2
                    ):
                        if cid3 == b"strf" and size3 >= 40:
                            (_s, _bw, _bh, _p, bpp, comp) = (
                                struct.unpack_from("<IiiHHI", payload, off3)
                            )
        elif ltype == b"movi":
            for cid2, off2, size2 in _riff_walk(
                payload, off + 4, off + size
            ):
                if cid2[2:4] in (b"db", b"dc"):
                    frame_locs.append((off2, size2))
    if w is None or bpp is None:
        raise ValueError("malformed AVI: missing hdrl/avih/strf")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"AVI decode supports uncompressed 24-bit DIB frames only "
            f"(got bpp={bpp}, compression={comp}); compressed video "
            "needs a real codec on the cluster image"
        )
    if w <= 0 or h is None or h <= 0:
        raise ValueError(f"corrupt AVI dims {w}x{h}")
    if not frame_locs:
        raise ValueError("malformed AVI: no movi frames")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frame_locs), h, w, 3), dtype=np.uint8)
    for i, (o, s) in enumerate(frame_locs):
        if s < stride * h:
            raise ValueError(f"truncated AVI frame {i}")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=h * stride, offset=o
        ).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]
        out[i] = bgr[:, :, ::-1]
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Image decode: REAL for uncompressed 24-bit BMP (pure struct,
    returns (h, w, 3) RGB uint8) and for the deterministic fake
    container ((h, w) grayscale). Compressed formats (JPEG/PNG/...)
    raise NotImplementedError — install PIL/turbojpeg on the cluster
    image and extend this dispatch."""
    if payload is not None and payload[:2] == b"BM" and len(payload) > 54:
        return _decode_bmp(payload)
    hdr = _parse_header(payload)
    if hdr is None:
        raise NotImplementedError(
            "compressed image codecs are not available in this container; "
            "install PIL/turbojpeg on the cluster image and extend "
            "decode_image's dispatch"
        )
    _kind, w, h = hdr
    if w == 0 or h == 0:  # zero-dim image: no pixels to decode
        raise ValueError(f"corrupt fake-container dims {w}x{h}")
    body = np.frombuffer(payload[13:], dtype=np.uint8)
    pix = np.resize(body, (h, w))  # deterministic fake "decode"
    return pix


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Audio decode: REAL for RIFF/WAVE PCM-16 (pure struct, returns
    ((n_frames, channels) int16, sample_rate)); the deterministic fake
    container decodes its body as mono PCM at 16 kHz. Compressed audio
    raises NotImplementedError."""
    if payload is not None and payload[:4] == b"RIFF" \
            and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    hdr = _parse_header(payload)
    if hdr is None:
        raise NotImplementedError(
            "compressed audio codecs are not available in this container; "
            "extend decode_audio's dispatch on the cluster image"
        )
    body = payload[13:]
    frames = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
    return frames[:, None], 16000


def _probe_header(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """(kind, width, height, sample_rate, n_frames) from the container
    HEADER only — no pixel/frame decode, O(header bytes) per row."""
    if payload is None:
        return None, None, None, None, None
    try:
        if payload[:2] == b"BM" and len(payload) > 54:
            _size, w, h, *_ = struct.unpack_from("<IiiHHI", payload, 14)
            return "image", int(w), abs(int(h)), None, None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            chunks = _wav_chunks(payload)
            if b"fmt " in chunks:
                fo, _ = chunks[b"fmt "]
                _f, ch, rate, _br, _ba, _b = struct.unpack_from(
                    "<HHIIHH", payload, fo
                )
                n = chunks[b"data"][1] // (2 * max(ch, 1)) \
                    if b"data" in chunks else None
                return "audio", None, None, int(rate), n
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            # header-only: dims + frame count from avih, no frame decode
            for cid, off, size in _riff_walk(payload, 12, len(payload)):
                if cid == b"LIST" and payload[off:off + 4] == b"hdrl":
                    for cid2, off2, size2 in _riff_walk(
                        payload, off + 4, off + size
                    ):
                        if cid2 == b"avih" and size2 >= 56:
                            vals = struct.unpack_from("<14I", payload, off2)
                            return ("video", int(vals[8]), int(vals[9]),
                                    None, int(vals[4]))
            return None, None, None, None, None
    except struct.error:
        # magic matched but the header is truncated/corrupt — null
        # metadata, never an exception (a bad row must not kill a scan)
        return None, None, None, None, None
    hdr = _parse_header(payload)
    if hdr is not None:
        kind, w, h = hdr
        return kind, w, h, 16000 if kind == "audio" else None, None
    return None, None, None, None, None


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Header-only metadata pass — cheap, no full decode, vectorized.
    Recognizes real BMP and RIFF/WAVE headers plus the fake container;
    unknown containers yield null metadata (never an error — at 100 TB
    a corrupt header must not kill the scan)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_probe_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind_parsed": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                    "sample_rate": pd.array(
                        [m[3] for m in metas], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [m[4] for m in metas], dtype="Int64"
                    ),
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        gen,
        schema=(
            "media_id long, kind_parsed string, width int, height int,"
            " sample_rate int, n_frames long, payload_bytes long"
        ),
    )


def image_features(media: DataFrame, thumb: int = 8) -> DataFrame:
    """Decode → downsample → feature vector, batched via mapInPandas.

    The decode step uses the codec hook above; the rest (downsample,
    normalize, flatten) is the real numpy pipeline that would run
    against true decodes unchanged.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    pix = decode_image(payload)
                    if pix.ndim == 3:  # real RGB decode → luma
                        pix = pix.mean(axis=2)
                    h, w = pix.shape
                    ys = np.linspace(0, h - 1, thumb).astype(int)
                    xs = np.linspace(0, w - 1, thumb).astype(int)
                    small = pix[np.ix_(ys, xs)].astype(np.float32) / 255.0
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    # no codec / truncated or lying header: skip the
                    # row — a corrupt payload must not kill the scan
                    continue
                ids.append(mid)
                feats.append(small.ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    # object dtype: an EMPTY default column reaches Arrow
                    # as float64, which cannot convert to list<float>
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(gen, schema="media_id long, feature array<float>")


def audio_features(media: DataFrame, n_windows: int = 8) -> DataFrame:
    """Decode → fixed-window RMS energy profile, batched via
    mapInPandas: the audio analog of image_features (frame-sampling a
    long signal into a fixed-size feature). Real WAV PCM-16 payloads
    decode for real; compressed audio is skipped via the codec hook."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, counts, feats = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames, rate = decode_audio(payload)
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    continue  # same corrupt-row policy as image_features
                mono = frames.astype(np.float32).mean(axis=1) / 32768.0
                n = len(mono)
                if n == 0:
                    rms = [0.0] * n_windows
                else:
                    # n_windows equal slices (last one absorbs remainder)
                    edges = np.linspace(0, n, n_windows + 1).astype(int)
                    rms = [
                        float(np.sqrt(np.mean(mono[a:b] ** 2))) if b > a
                        else 0.0
                        for a, b in zip(edges[:-1], edges[1:])
                    ]
                ids.append(mid)
                rates.append(rate)
                counts.append(n)
                feats.append(rms)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int64"),
                    # object dtype: an EMPTY default-dtype column arrives
                    # at Arrow as float64 ndarray, which cannot convert
                    # to list<float>
                    "rms": pd.Series(feats, dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(
        gen,
        schema="media_id long, sample_rate int, n_samples long,"
               " rms array<float>",
    )


def decode_video_frames(
    payload: bytes, n_frames: int | None = None
) -> np.ndarray:
    """Video decode: REAL for uncompressed RIFF/AVI ('00db' 24-bit DIB
    frames, pure struct+numpy, returns (n, h, w, 3) RGB uint8); the
    deterministic FAKE container decodes its body as a stack of w×h
    grayscale frames ((n, h, w) uint8; trailing partial frame dropped).
    Compressed codecs (H.264/VP9) raise NotImplementedError — extend
    the dispatch with PyAV/ffmpeg on the cluster image."""
    if payload is not None and payload[:4] == b"RIFF" \
            and payload[8:12] == b"AVI ":
        frames = _decode_avi(payload)
        if n_frames is not None and len(frames) > 0:
            idx = np.linspace(
                0, len(frames) - 1, min(n_frames, len(frames))
            ).astype(int)
            frames = frames[idx]
        return frames
    hdr = _parse_header(payload)
    if hdr is None or hdr[0] != "video":
        raise NotImplementedError(
            "compressed video codecs are not available in this container; "
            "extend decode_video_frames's dispatch on the cluster image"
        )
    _kind, w, h = hdr
    body = np.frombuffer(payload[13:], dtype=np.uint8)
    per = w * h
    n = len(body) // per if per else 0
    frames = body[: n * per].reshape(n, h, w)
    if n_frames is not None and n > 0:
        # deterministic uniform frame sample (first/last included)
        idx = np.linspace(0, n - 1, min(n_frames, n)).astype(int)
        frames = frames[idx]
    return frames


def video_frame_features(
    media: DataFrame, n_sample: int = 4, thumb: int = 8
) -> DataFrame:
    """Frame-sample → per-frame thumbnail features, batched via
    mapInPandas: uniformly sample n_sample frames per video and emit
    one (media_id, frame_idx, feature) row per sampled frame — the
    video analog of image_features, exploded so downstream dedup can
    treat frames as documents."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_video_frames(payload, n_frames=n_sample)
                    rows = []
                    for j, frame in enumerate(frames):
                        if frame.ndim == 3:  # real RGB decode → luma
                            frame = frame.mean(axis=2)
                        h, w = frame.shape
                        if h == 0 or w == 0:
                            raise ValueError("zero-dim frame")
                        ys = np.linspace(0, h - 1, thumb).astype(int)
                        xs = np.linspace(0, w - 1, thumb).astype(int)
                        small = (frame[np.ix_(ys, xs)]
                                 .astype(np.float32) / 255.0)
                        rows.append((j, small.ravel().tolist()))
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    continue  # same corrupt-row policy as the others
                for j, feat in rows:
                    ids.append(mid)
                    idxs.append(j)
                    feats.append(feat)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(
        gen, schema="media_id long, frame_idx int, feature array<float>"
    )


def image_thumb_keys(
    page_media: DataFrame, thumb: int = 8
) -> DataFrame:
    """(url, thumb_key): deterministic 64-bit key of each page image's
    luma thumbnail — the media-dedup blocking key. Decode → luma →
    thumb×thumb integer downsample → md5 → first 8 bytes as a signed
    long. Integer pixels end-to-end (no float jitter), so the same
    image bytes always key identically; corrupt/undecodable payloads
    are skipped per-row (same totality policy as image_features)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            urls, keys = [], []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                try:
                    pix = decode_image(payload)
                    if pix.ndim == 3:
                        # integer luma: mean would reintroduce floats
                        pix = (pix.astype(np.uint32).sum(axis=2) // 3)
                    h, w = pix.shape
                    if h == 0 or w == 0:
                        raise ValueError("zero-dim image")
                    ys = np.linspace(0, h - 1, thumb).astype(int)
                    xs = np.linspace(0, w - 1, thumb).astype(int)
                    small = pix[np.ix_(ys, xs)].astype(np.uint8)
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    continue
                digest = hashlib.md5(small.tobytes()).digest()
                urls.append(url)
                keys.append(int.from_bytes(digest[:8], "little",
                                           signed=True))
            yield pd.DataFrame({"url": urls, "thumb_key": keys})

    return page_media.select("url", "payload").mapInPandas(
        gen, schema="url string, thumb_key long"
    )


def media_dup_pairs(
    page_media: DataFrame,
    cfg,
    thumb: int = 8,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Media dedup CHANNEL: candidate pairs of pages carrying the same
    image (identical luma thumbnail), built with the standard bucket →
    pair machinery (hot-bucket star expansion for logo/boilerplate
    images that appear on millions of pages — the channel's skew case).

    page_media: (url, payload) — one image payload per page row.
    Returns (pairs, hot_buckets). Feed `pairs` to run_dedup's
    bypass_jaccard_channels: thumbnail identity IS the channel's
    similarity evidence (two pages sharing an image but no text have
    sub-threshold Jaccard by construction), but every pair still runs
    the full reason-gate stack — the reference feeds every pair through
    canMerge regardless of provenance
    (marc-record-merge-melindautils.js:84-104)."""
    from dedup.candidates import pairs_from_buckets

    keys = image_thumb_keys(page_media, thumb)
    return pairs_from_buckets(
        keys, ["thumb_key"], cfg, cache_registry=cache_registry
    )


def real_media_corpus(spark, n: int = 48, seed: int = 7) -> DataFrame:
    """Deterministic corpus of REAL containers — 24-bit BMPs, PCM-16
    WAVs and uncompressed DIB AVIs written by this module's own struct
    packers — so the decode → feature pipelines are exercised against
    true bytes end-to-end."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 == 0:
            w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append(
                (i, "image", bytearray(pack_bmp(pix)), (w, h, None, None))
            )
        elif i % 3 == 1:
            rate = int(rng.choice([8000, 16000, 44100]))
            n_s = int(rng.integers(200, 2000))
            ch = int(rng.choice([1, 2]))
            pcm = rng.integers(-(2 ** 15), 2 ** 15, (n_s, ch)).astype(
                np.int16
            )
            rows.append(
                (i, "audio", bytearray(pack_wav(pcm, rate)),
                 (None, None, rate, n_s))
            )
        else:
            w, h = int(rng.integers(12, 32)), int(rng.integers(12, 32))
            nf = int(rng.integers(2, 9))
            vid = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
            rows.append(
                (i, "video", bytearray(pack_avi(vid)), (w, h, None, nf))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def fake_media_corpus(spark, n: int = 64, seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        body = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        rows.append(
            (i, kind, bytearray(pack_fake_media(kind, w, h, body)),
             (w, h, 16000 if kind == "audio" else None,
              30 if kind == "video" else None))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
