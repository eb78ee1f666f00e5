"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (training-data pipeline component).

The Spark-side plumbing is real and tested: schemas, partition-friendly
batch shapes, mapInPandas signatures, metadata extraction from
deterministic container headers. The codec work itself (JPEG decode,
resampling, frame extraction) is stubbed behind clearly-marked hooks —
the image/audio libraries are not in this container — with a
deterministic fake used by tests so the distributed plumbing is
exercised end-to-end.
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
    kind = ["image", "audio", "video"][payload[4]]
    w, h = struct.unpack("<II", payload[5:13])
    return kind, w, h


def decode_image(payload: bytes) -> np.ndarray:
    """REAL-CODEC HOOK — would be PIL/turbojpeg on a cluster image.

    Raises NotImplementedError for genuine image formats; decodes the
    deterministic fake container so the distributed plumbing is testable.
    """
    hdr = _parse_header(payload)
    if hdr is None:
        raise NotImplementedError(
            "real image codecs are not available in this container; "
            "install PIL/turbojpeg on the cluster image and replace this hook"
        )
    _kind, w, h = hdr
    body = np.frombuffer(payload[13:], dtype=np.uint8)
    pix = np.resize(body, (h, w))  # deterministic fake "decode"
    return pix


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Header-only metadata pass — cheap, no full decode, vectorized."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_parse_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind_parsed": [m[0] if m else None for m in metas],
                    "width": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int32"
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
            " payload_bytes long"
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
                except NotImplementedError:
                    continue
                h, w = pix.shape
                ys = np.linspace(0, h - 1, thumb).astype(int)
                xs = np.linspace(0, w - 1, thumb).astype(int)
                small = pix[np.ix_(ys, xs)].astype(np.float32) / 255.0
                ids.append(mid)
                feats.append(small.ravel().tolist())
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(gen, schema="media_id long, feature array<float>")


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
