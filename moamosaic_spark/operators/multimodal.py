"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic pseudo-decode (seeded from the payload hash)
produces a real ndarray of the declared shape. Everything Spark-side —
schemas, batch iteration, partitioning, UDF signatures, output
contracts — is real and tested; swapping the stub for PIL/ffmpeg is a
one-function change.

Media rows: (media_id string, kind string 'image'|'audio'|'video',
payload binary, meta struct<width,height,channels,sample_rate,n_frames>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_image(payload: bytes, width: int, height: int, channels: int,
                 fake: bool = False) -> np.ndarray:
    """Decode an image payload to (height, width, channels) uint8.

    STUB: real codecs are unavailable in this container. With
    ``fake=True`` a deterministic pseudo-decode derives pixels from the
    payload's sha256 (stable across runs and partitionings)."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub or swap in PIL/opencv here"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _phash(gray: np.ndarray, bits: int = 64) -> int:
    """Average-hash perceptual fingerprint on an 8x8 downsample."""
    h, w = gray.shape
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    cells = np.array(
        [
            gray[ys[i]: ys[i + 1], xs[j]: xs[j + 1]].mean()
            for i in range(8)
            for j in range(8)
        ]
    )
    bitsv = (cells > cells.mean()).astype(np.uint64)
    return int((bitsv << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64) % (1 << 63))


def image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract image rows via mapInPandas (Arrow
    batches; one decode per row, vectorized stats per image)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                m = r.meta
                arr = decode_image(
                    bytes(r.payload), m["width"], m["height"], m["channels"],
                    fake=fake_decode,
                )
                gray = arr.mean(axis=2)
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": int(m["width"]),
                        "height": int(m["height"]),
                        "mean_intensity": float(arr.mean()),
                        "std_intensity": float(arr.std()),
                        "phash": _phash(gray),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  fake_decode: bool = True) -> DataFrame:
    """Nearest-neighbour resize (the reference's overview resampling rule,
    mosaic.py:734, generalized to arbitrary target shapes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                m = r.meta
                arr = decode_image(
                    bytes(r.payload), m["width"], m["height"], m["channels"],
                    fake=fake_decode,
                )
                gray = arr.mean(axis=2).astype(np.int32)
                ys = (np.arange(out_h) * m["height"] // out_h).astype(int)
                xs = (np.arange(out_w) * m["width"] // out_w).astype(int)
                resized = gray[np.ix_(ys, xs)]
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": out_w,
                        "height": out_h,
                        "pixels": resized.ravel(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA])

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10,
                  fake_decode: bool = True) -> DataFrame:
    """Video frame sampling: emit every-n-th frame's features. Frames are
    pseudo-decoded per (payload, frame_idx) — the UDTF-style 1->N row
    expansion is the real plumbing under any codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                m = r.meta
                for idx in range(0, int(m["n_frames"]), every_n):
                    frame = decode_image(
                        bytes(r.payload) + idx.to_bytes(4, "big"),
                        m["width"], m["height"], m["channels"],
                        fake=fake_decode,
                    )
                    out.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "mean_intensity": float(frame.mean()),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def synth_media(spark, n: int = 20, seed: int = 7) -> DataFrame:
    """Deterministic fake media table (binary payloads from the seed)."""
    rows = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        kind = ["image", "image", "audio", "video"][i % 4]
        payload = rng.bytes(64)
        rows.append(
            {
                "media_id": f"m{i:04d}",
                "kind": kind,
                "payload": bytearray(payload),
                "meta": {
                    "width": 64 + 8 * (i % 5),
                    "height": 48 + 8 * (i % 3),
                    "channels": 3,
                    "sample_rate": 16000,
                    "n_frames": 30 if kind == "video" else 1,
                },
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
