"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas`` pipelines.

Decode is REAL for the formats parseable without codec libraries
(operators/codecs.py): uncompressed BMP, binary PPM/PGM, and 16-bit
PCM WAV are sniffed by magic bytes and decoded with pure numpy.
Compressed formats (JPEG/PNG/MP4, and video generally) still gate:
``fake=True`` substitutes a deterministic pseudo-decode (seeded from
the payload hash) of the declared shape; otherwise
NotImplementedError names the library to swap in. Everything
Spark-side — schemas, batch iteration, partitioning, UDF signatures,
output contracts — is identical on both paths.

Media rows: (media_id string, kind string 'image'|'audio'|'video',
payload binary, meta struct<width,height,channels,sample_rate,n_frames>)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import codecs

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

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
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

    BMP (``BM``) and binary PPM/PGM (``P6``/``P5``) payloads decode for
    real (operators/codecs.py, pure numpy); a grayscale source is
    broadcast up / an RGB source averaged down to the declared channel
    count, and a decoded size disagreeing with the declared meta raises
    (corrupt metadata must not flow silently into features). Other
    formats: ``fake=True`` gives the deterministic pseudo-decode
    (pixels from the payload's sha256 — stable across runs and
    partitionings); otherwise NotImplementedError."""
    payload = bytes(payload)
    magic = payload[:2]
    arr = None
    try:
        if magic == b"BM":
            arr = codecs.decode_bmp(payload)
        elif magic in (b"P6", b"P5"):
            arr = codecs.decode_ppm(payload)
    except (NotImplementedError, ValueError, struct.error, IndexError):
        # recognized container but unsupported VARIANT (e.g. RLE BMP,
        # 16-bit PGM) — or a corrupt/truncated body whose magic sniffed
        # fine (np.frombuffer buffer-too-small raises ValueError).
        # Honor the fake= contract — fake=True never raises — instead
        # of killing the whole mapInPandas job on one bad row.
        if not fake:
            raise
        arr = None
    if arr is None:
        if fake:
            seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
            rng = np.random.default_rng(seed)
            return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)
        raise NotImplementedError(
            "payload is not decodable BMP/PPM/PGM (the formats parseable "
            "without codec libs); pass fake=True for the deterministic stub "
            "or swap in PIL/opencv here"
        )
    if arr.shape[:2] != (height, width):
        raise ValueError(
            f"decoded image is {arr.shape[1]}x{arr.shape[0]} but meta declares "
            f"{width}x{height}"
        )
    if arr.shape[2] != channels:
        if arr.shape[2] == 1:
            arr = np.repeat(arr, channels, axis=2)
        elif channels == 1:
            arr = arr.mean(axis=2, keepdims=True).astype(np.uint8)
        else:
            raise ValueError(
                f"decoded {arr.shape[2]} channels, meta declares {channels}"
            )
    return arr


def decode_audio(payload: bytes, sample_rate: int,
                 fake: bool = False, fake_n: int = 16000) -> tuple[np.ndarray, int]:
    """Decode an audio payload to ((n, ch) int16 samples, rate). PCM
    WAV (``RIFF``) decodes for real; otherwise ``fake=True`` derives a
    deterministic int16 signal of ``fake_n`` samples from the payload
    hash at the declared rate."""
    payload = bytes(payload)
    if payload[:4] == b"RIFF":
        try:
            return codecs.decode_wav(payload)
        except (NotImplementedError, ValueError, struct.error, IndexError):
            if not fake:  # unsupported variant (float32, 24-bit, ...)
                raise    # ... or a corrupt/truncated body
    if fake:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(-2048, 2048, size=(fake_n, 1), dtype=np.int16), sample_rate
    raise NotImplementedError(
        "payload is not decodable PCM WAV (the format parseable without "
        "codec libs); pass fake=True for the deterministic stub or swap in "
        "soundfile here"
    )


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


def audio_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Decode + feature-extract audio rows via mapInPandas: duration,
    RMS level, zero-crossing count — the standard cheap audio-quality
    gates for a training corpus. Real decode for PCM WAV payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                samples, rate = decode_audio(
                    bytes(r.payload), r.meta["sample_rate"], fake=fake_decode
                )
                mono = samples.astype(np.float64).mean(axis=1)
                n = mono.shape[0]
                out.append(
                    {
                        "media_id": r.media_id,
                        "sample_rate": int(rate),
                        "n_samples": int(n),
                        "duration_s": float(n / rate),
                        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
                        "zero_crossings": int(np.sum(np.signbit(mono[1:]) != np.signbit(mono[:-1]))),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def decode_video(payload: bytes, width: int, height: int, n_frames: int,
                 fake: bool = False) -> np.ndarray:
    """Decode a video payload to (n, height, width) uint8 LUMA frames.
    YUV4MPEG2 (``YUV4MPEG2`` magic — the standard uncompressed video
    container) decodes for real via pure numpy; other formats gate
    behind ``fake=True`` (per-frame pseudo-decode of the declared
    shape, seeded from (payload, frame_idx))."""
    payload = bytes(payload)
    if payload.startswith(b"YUV4MPEG2"):
        try:
            frames, _ = codecs.decode_y4m(payload)
            if frames.shape[1:] != (height, width):
                raise ValueError(
                    f"decoded video is {frames.shape[2]}x{frames.shape[1]} but "
                    f"meta declares {width}x{height}"
                )
            return frames
        except (NotImplementedError, ValueError, struct.error, IndexError):
            if not fake:  # unsupported variant or corrupt/truncated body
                raise
    if fake:
        return np.stack([
            decode_image(
                payload + idx.to_bytes(4, "big"), width, height, 1, fake=True
            )[:, :, 0]
            for idx in range(int(n_frames))
        ])
    raise NotImplementedError(
        "payload is not decodable YUV4MPEG2 (the video container parseable "
        "without codec libs); pass fake=True for the deterministic stub or "
        "swap in ffmpeg here"
    )


def sample_frames(media: DataFrame, every_n: int = 10,
                  fake_decode: bool = True) -> DataFrame:
    """Video frame sampling: emit every-n-th frame's features via the
    UDTF-style 1->N row expansion. Y4M payloads decode for real
    (luma); other containers use the per-frame pseudo-decode behind
    ``fake_decode``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                m = r.meta
                frames = decode_video(
                    bytes(r.payload), m["width"], m["height"], m["n_frames"],
                    fake=fake_decode,
                )
                for idx in range(0, frames.shape[0], every_n):
                    out.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "mean_intensity": float(frames[idx].mean()),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


VIDEO_FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),    # = media_id
        T.StructField("shingle", T.StringType()),   # = per-frame hash
    ]
)


def video_frame_hashes(media: DataFrame, every_n: int = 1,
                       fake_decode: bool = False) -> DataFrame:
    """Distinct (doc_id=media_id, shingle=frame perceptual hash)
    postings over video rows — the video analog of text shingle
    postings, shaped for functions.dedup.postings_jaccard_pairs /
    minhash. The hash is the 8x8 average-hash of each sampled luma
    frame (the same _phash as image_features), so re-encoded or
    re-containered copies of a clip land on identical postings."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                m = r.meta
                frames = decode_video(
                    bytes(r.payload), m["width"], m["height"], m["n_frames"],
                    fake=fake_decode,
                )
                for idx in range(0, frames.shape[0], every_n):
                    out.append(
                        {
                            "doc_id": r.media_id,
                            "shingle": format(_phash(frames[idx].astype(np.float64)), "x"),
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "shingle"])

    return media.mapInPandas(run, VIDEO_FRAME_HASH_SCHEMA).distinct()


def video_neardup_pairs(media: DataFrame, threshold: float = 0.5,
                        every_n: int = 1,
                        fake_decode: bool = False) -> DataFrame:
    """Near-duplicate VIDEO pairs: Jaccard over per-frame hash sets via
    the shared inverted-index machinery (a pair is compared iff it
    shares >= 1 frame hash — disjoint clips cost nothing; same scale
    shape as text dedup). Returns (doc_a, doc_b, jaccard)."""
    from ..functions.dedup import postings_jaccard_pairs

    return postings_jaccard_pairs(
        video_frame_hashes(media, every_n, fake_decode), threshold
    )


def _synth_media_source(n: int = 20, seed: int = 7):
    """The SOURCE arrays behind synth_media's payloads, pre-encoding.
    Shared by the payload minting (synth_media) and the decoded-truth
    sidecar (media_truth_features) so the truth can never drift from
    the corpus: both consume this generator's rng stream verbatim."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        kind = ["image", "image", "audio", "video"][i % 4]
        w, h = 64 + 8 * (i % 5), 48 + 8 * (i % 3)
        rec = {"media_id": f"m{i:04d}", "kind": kind, "w": w, "h": h}
        if kind == "video":
            rec["frames"] = rng.integers(0, 256, size=(30, h, w), dtype=np.uint8)
        elif kind == "image":
            rec["img"] = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rec["fmt"] = "bmp" if i % 4 == 0 else "ppm"
        else:  # audio: 0.1 s deterministic tone + noise
            t = np.arange(1600)
            sig = 4000 * np.sin(2 * np.pi * (110 + 13 * i) * t / 16000)
            rec["sig"] = (sig + rng.integers(-256, 256, size=t.shape)).astype(np.int16)
        yield rec


def media_rows(n: int = 20, seed: int = 7,
               real_payloads: bool = True) -> list[dict]:
    """Plain-dict rows behind synth_media — shared with the parquet
    fixture minter (fixtures.py) so the on-disk corpus and the
    in-memory table can never drift."""
    rows = []
    if real_payloads:
        recs = list(_synth_media_source(n, seed))
    else:
        rng = np.random.default_rng(seed)
        recs = []
        for i in range(n):
            recs.append({
                "media_id": f"m{i:04d}",
                "kind": ["image", "image", "audio", "video"][i % 4],
                "w": 64 + 8 * (i % 5), "h": 48 + 8 * (i % 3),
                "opaque": rng.bytes(64),
            })
    for rec in recs:
        kind, w, h = rec["kind"], rec["w"], rec["h"]
        if not real_payloads:
            payload = rec["opaque"]
        elif kind == "video":
            payload = codecs.encode_y4m(rec["frames"])
        elif kind == "image":
            payload = (codecs.encode_bmp(rec["img"]) if rec["fmt"] == "bmp"
                       else codecs.encode_ppm(rec["img"]))
        else:
            payload = codecs.encode_wav(rec["sig"], 16000)
        rows.append(
            {
                "media_id": rec["media_id"],
                "kind": kind,
                "payload": bytearray(payload),
                "meta": {
                    "width": w,
                    "height": h,
                    "channels": 3,
                    "sample_rate": 16000,
                    "n_frames": 30 if kind == "video" else 1,
                },
            }
        )
    return rows


def synth_media(spark, n: int = 20, seed: int = 7,
                real_payloads: bool = True) -> DataFrame:
    """Deterministic media table. With ``real_payloads`` (default)
    image rows carry genuine BMP/PPM bytes (alternating), audio rows
    genuine PCM WAV bytes, and video rows genuine YUV4MPEG2 bytes —
    the real-decode path end-to-end for every modality.
    ``real_payloads=False`` reverts every kind to opaque bytes (the
    ``fake=`` stub path)."""
    return spark.createDataFrame(media_rows(n, seed, real_payloads),
                                 schema=MEDIA_SCHEMA)


AUDIO_CHUNK_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),    # = media_id
        T.StructField("shingle", T.StringType()),   # = chunk hash
    ]
)


def audio_chunk_hashes(media: DataFrame, chunk_samples: int = 1024,
                       fake_decode: bool = False) -> DataFrame:
    """Distinct (doc_id=media_id, shingle=sample-chunk hash) postings
    over audio rows — the audio analog of text shingles and video
    frame hashes, shaped for functions.dedup.postings_jaccard_pairs.
    Chunks are fixed windows of the mono-folded int16 stream hashed
    with md5, so bit-identical re-containered copies (and copies with
    localized edits) land on mostly-shared postings. The trailing
    partial chunk is hashed too (an edit there still changes exactly
    one posting)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                samples, _ = decode_audio(
                    bytes(r.payload), r.meta["sample_rate"], fake=fake_decode
                )
                mono = samples.astype(np.int32).mean(axis=1).astype(np.int16)
                for i in range(0, mono.shape[0], chunk_samples):
                    chunk = mono[i: i + chunk_samples]
                    out.append({
                        "doc_id": r.media_id,
                        "shingle": hashlib.md5(chunk.tobytes()).hexdigest()[:16],
                    })
            yield pd.DataFrame(out, columns=["doc_id", "shingle"])

    return media.mapInPandas(run, AUDIO_CHUNK_HASH_SCHEMA).distinct()


def audio_neardup_pairs(media: DataFrame, threshold: float = 0.5,
                        chunk_samples: int = 1024,
                        fake_decode: bool = False) -> DataFrame:
    """Near-duplicate AUDIO pairs: Jaccard over chunk-hash sets via the
    shared inverted-index machinery. Returns (doc_a, doc_b, jaccard)."""
    from ..functions.dedup import postings_jaccard_pairs

    return postings_jaccard_pairs(
        audio_chunk_hashes(media, chunk_samples, fake_decode), threshold
    )


def _synth_audio_source(n_families: int = 3, n_samples: int = 16384,
                        rate: int = 16000, seed: int = 29):
    """Source signals for an audio corpus WITH planted near-duplicates:
    family j = base b{j}; variant v{j} sharing all but the last quarter
    of samples (chunk Jaccard 12/20 = 0.6 at 1024-sample chunks);
    unrelated u{j}."""
    rng = np.random.default_rng(seed)
    for j in range(n_families):
        base = rng.integers(-8192, 8192, size=n_samples).astype(np.int16)
        variant = base.copy()
        cut = n_samples - n_samples // 4
        variant[cut:] = rng.integers(-8192, 8192, size=n_samples - cut).astype(np.int16)
        unrelated = rng.integers(-8192, 8192, size=n_samples).astype(np.int16)
        yield f"b{j}", base
        yield f"v{j}", variant
        yield f"u{j}", unrelated


def audio_clip_rows(n_families: int = 3, n_samples: int = 16384,
                    rate: int = 16000, seed: int = 29) -> list[dict]:
    """Plain-dict rows behind synth_audio_clips (shared with the
    parquet fixture minter)."""
    rows = []
    for clip_id, sig in _synth_audio_source(n_families, n_samples, rate, seed):
        rows.append({
            "media_id": clip_id,
            "kind": "audio",
            "payload": bytearray(codecs.encode_wav(sig, rate)),
            "meta": {"width": 0, "height": 0, "channels": 1,
                     "sample_rate": rate, "n_frames": 0},
        })
    return rows


def synth_audio_clips(spark, n_families: int = 3, n_samples: int = 16384,
                      rate: int = 16000, seed: int = 29) -> DataFrame:
    """Deterministic PCM-WAV clip table with planted near-duplicates —
    the audio_neardup_pairs fixture."""
    return spark.createDataFrame(
        audio_clip_rows(n_families, n_samples, rate, seed),
        schema=MEDIA_SCHEMA)


def audio_truth_postings(n_families: int = 3, n_samples: int = 16384,
                         rate: int = 16000, seed: int = 29,
                         chunk_samples: int = 1024) -> list[tuple[str, str]]:
    """Chunk-hash sidecar for synth_audio_clips, computed from the
    SOURCE signals at mint time (decode never touched). Mono clips
    round-trip WAV bit-exactly, so the mono fold is the identity on
    the source samples."""
    posts = set()
    for clip_id, sig in _synth_audio_source(n_families, n_samples, rate, seed):
        for i in range(0, sig.shape[0], chunk_samples):
            posts.add((
                clip_id,
                hashlib.md5(sig[i: i + chunk_samples].tobytes()).hexdigest()[:16],
            ))
    return sorted(posts)


def _synth_video_source(n_families: int = 3, n_frames: int = 20,
                        size: int = 32, seed: int = 13):
    """Source frames for a video corpus WITH planted near-duplicates.
    Family j mints three clips: base b{j}; variant v{j} sharing all but
    the last 4 frames (Jaccard 16/24 = 0.666...); unrelated u{j} fully
    independent. Expected near-dup pairs at threshold 0.5 are exactly
    the (b{j}, v{j}) pairs. Even dims (4:2:0 chroma)."""
    rng = np.random.default_rng(seed)
    for j in range(n_families):
        base = rng.integers(0, 256, size=(n_frames, size, size), dtype=np.uint8)
        variant = base.copy()
        variant[-4:] = rng.integers(0, 256, size=(4, size, size), dtype=np.uint8)
        unrelated = rng.integers(0, 256, size=(n_frames, size, size), dtype=np.uint8)
        yield f"b{j}", base
        yield f"v{j}", variant
        yield f"u{j}", unrelated


def video_clip_rows(n_families: int = 3, n_frames: int = 20,
                    size: int = 32, seed: int = 13) -> list[dict]:
    """Plain-dict rows behind synth_video_clips (shared with the
    parquet fixture minter)."""
    rows = []
    for clip_id, frames in _synth_video_source(n_families, n_frames, size, seed):
        rows.append({
            "media_id": clip_id,
            "kind": "video",
            "payload": bytearray(codecs.encode_y4m(frames)),
            "meta": {"width": size, "height": size, "channels": 1,
                     "sample_rate": 0, "n_frames": frames.shape[0]},
        })
    return rows


def synth_video_clips(spark, n_families: int = 3, n_frames: int = 20,
                      size: int = 32, seed: int = 13) -> DataFrame:
    """Deterministic Y4M clip table (media rows, kind='video') with
    planted near-duplicates — the video_neardup_pairs fixture."""
    return spark.createDataFrame(
        video_clip_rows(n_families, n_frames, size, seed),
        schema=MEDIA_SCHEMA)


def video_truth_postings(n_families: int = 3, n_frames: int = 20,
                         size: int = 32, seed: int = 13) -> list[tuple[str, str]]:
    """Frame-hash sidecar for synth_video_clips, computed from the
    SOURCE frames at mint time (decode never touched): the distinct
    (clip_id, frame-phash-hex) postings a DuckDB oracle replays the
    postings Jaccard over."""
    posts = set()
    for clip_id, frames in _synth_video_source(n_families, n_frames, size, seed):
        for idx in range(frames.shape[0]):
            posts.add((clip_id, format(_phash(frames[idx].astype(np.float64)), "x")))
    return sorted(posts)


def media_truth_frame_samples(n: int = 20, seed: int = 7,
                              every_n: int = 10) -> list[dict]:
    """Expected sample_frames output for synth_media's video rows,
    computed from the SOURCE frames at mint time (Y4M luma round-trips
    bit-exactly, so decode is gated end-to-end)."""
    out = []
    for rec in _synth_media_source(n, seed):
        if rec["kind"] != "video":
            continue
        frames = rec["frames"]
        for idx in range(0, frames.shape[0], every_n):
            out.append({
                "media_id": rec["media_id"],
                "frame_idx": idx,
                "mean_intensity": float(frames[idx].mean()),
            })
    return out


def media_truth_features(n: int = 20, seed: int = 7) -> tuple[list, list]:
    """Decoded-truth sidecar for synth_media(real_payloads=True):
    expected image and audio features computed straight from the SOURCE
    arrays at mint time — the decode path is never touched, so this is
    an independent oracle over encode -> decode -> feature-extract.
    Returns (image_rows, audio_rows) of plain dicts; driver_contract
    embeds them as a DuckDB VALUES relation."""
    imgs, auds = [], []
    for rec in _synth_media_source(n, seed):
        if rec["kind"] == "image":
            arr = rec["img"]
            imgs.append({
                "media_id": rec["media_id"],
                "width": rec["w"],
                "height": rec["h"],
                "mean_intensity": float(arr.mean()),
                "std_intensity": float(arr.std()),
                "phash": _phash(arr.mean(axis=2)),
            })
        elif rec["kind"] == "audio":
            mono = rec["sig"][:, None].astype(np.float64).mean(axis=1)
            nsamp = mono.shape[0]
            auds.append({
                "media_id": rec["media_id"],
                "sample_rate": 16000,
                "n_samples": nsamp,
                "duration_s": float(nsamp / 16000),
                "rms": float(np.sqrt(np.mean(mono**2))),
                "zero_crossings": int(np.sum(
                    np.signbit(mono[1:]) != np.signbit(mono[:-1])
                )),
            })
    return imgs, auds
