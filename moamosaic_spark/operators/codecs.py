"""Pure-numpy media codecs — the honest end of the multimodal pipeline.

The container has no PIL/opencv/ffmpeg, but three ubiquitous container
formats need NO codec library: uncompressed BMP (BITMAPINFOHEADER),
binary PPM/PGM (netpbm P6/P5), and PCM WAV are header parsing plus
``np.frombuffer``. These give `operators/multimodal.py` a real decode
path end-to-end (decode -> feature-extract -> resize on actual pixel
bytes); compressed formats (JPEG/PNG/MP4) still gate behind
``fake=True`` or a library swap-in.

Encoders exist so the synthetic corpus generator can mint real
payloads deterministically and tests can assert bit-exact roundtrips.
All functions are plain bytes -> ndarray (no Spark): they run inside
Arrow-batched ``mapInPandas`` workers, one call per row, vectorized
within the row.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (Windows bitmap, BITMAPINFOHEADER, uncompressed 8-bit or 24-bit)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (h, w, 3) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 8-bit (paletted) or 24-bit BMP -> (h, w, 3) uint8 RGB.
    Handles bottom-up (positive height) and top-down (negative) rows and
    the 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"only uncompressed 8/24-bit BMP decodable without codec libs "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down, h = h < 0, abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    # biClrUsed (file offset 46 = info-header offset 32): 0 = full table.
    clr_used = (int.from_bytes(payload[46:50], "little") or 256) if bpp == 8 else 0
    if data_off == 0:
        # some writers leave bfOffBits zero: pixels start right after
        # the info header and (for 8-bit) the actual-size palette.
        data_off = 14 + hdr_size + clr_used * 4
    raw = np.frombuffer(payload, np.uint8, row_bytes * h, data_off).reshape(h, row_bytes)
    if bpp == 24:
        img = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        # Size the palette read by biClrUsed; a fixed 1024-byte read
        # would overrun into pixel data (or past EOF) for files that
        # store a shorter table. Pad to 256 entries before indexing.
        pal_off = 14 + hdr_size
        pal = np.zeros((256, 4), np.uint8)
        pal[:clr_used] = np.frombuffer(
            payload, np.uint8, clr_used * 4, pal_off
        ).reshape(clr_used, 4)
        img = pal[raw[:, :w]][:, :, 2::-1]  # BGRA entries -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary: P6 = RGB, P5 = grayscale)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6, or (h, w)/(h, w, 1) uint8 -> P5."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 3:
        magic = b"P6"
    elif arr.shape[2] == 1:
        magic = b"P5"
    else:
        raise ValueError(f"encode_ppm wants 1 or 3 channels, got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6/P5 -> (h, w, 3|1) uint8. Tolerates comments and any
    whitespace in the header (the netpbm spec); exactly ONE whitespace
    byte follows maxval before the raster."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    w, h, maxv = fields
    if maxv != 255:
        raise NotImplementedError("only 8-bit PPM/PGM supported")
    ch = 3 if magic == b"P6" else 1
    return np.frombuffer(payload, np.uint8, w * h * ch, i).reshape(h, w, ch).copy()


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2, uncompressed video, 4:2:0 / 4:4:4 / mono)
# ---------------------------------------------------------------------------

_Y4M_PLANES = {"420": 1.5, "444": 3.0, "mono": 1.0}  # bytes/px (luma=1)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               colorspace: str = "420") -> bytes:
    """(n, h, w) uint8 LUMA frames -> YUV4MPEG2 bytes (chroma planes
    filled neutral 128 for 420/444; 'mono' has luma only). h and w must
    be even for 420 (the subsampled chroma planes are (h/2, w/2))."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"encode_y4m wants (n, h, w) uint8 luma, got {f.shape}")
    n, h, w = f.shape
    if colorspace not in _Y4M_PLANES:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    if colorspace == "420" and (h % 2 or w % 2):
        raise ValueError("4:2:0 needs even frame dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n".encode()
    if colorspace == "420":
        chroma = np.full((h // 2) * (w // 2) * 2, 128, dtype=np.uint8).tobytes()
    elif colorspace == "444":
        chroma = np.full(h * w * 2, 128, dtype=np.uint8).tobytes()
    else:
        chroma = b""
    body = b"".join(b"FRAME\n" + f[i].tobytes() + chroma for i in range(n))
    return head + body


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 -> ((n, h, w) uint8 LUMA frames, (fps_num, fps_den)).
    Supports C420*, C444 and Cmono; chroma planes are parsed (sized)
    but only luma is returned — the features this pipeline extracts
    (per-frame intensity stats, hashes) are luma-only."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    cs = "420"
    for tok in payload[10:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            a, b = t[1:].split(":")
            fps = (int(a), int(b))
        elif t[0] == "C":
            base = t[1:]
            cs = "420" if base.startswith("420") else base
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cs not in _Y4M_PLANES:
        raise NotImplementedError(
            f"only C420/C444/Cmono Y4M decodable without codec libs (got C{cs})"
        )
    frame_bytes = int(h * w * _Y4M_PLANES[cs])
    luma = h * w
    frames = []
    i = nl + 1
    while i < len(payload):
        j = payload.index(b"\n", i)  # FRAME line (may carry params)
        if not payload[i:j].startswith(b"FRAME"):
            raise ValueError("malformed Y4M: expected FRAME marker")
        i = j + 1
        frames.append(
            np.frombuffer(payload, np.uint8, luma, i).reshape(h, w)
        )
        i += frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps


# ---------------------------------------------------------------------------
# WAV (RIFF, 16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> PCM WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n, ch) int16 samples, sample_rate). Walks RIFF
    chunks (skipping extras like LIST), enforcing 16-bit PCM."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate = struct.unpack("<HHI", fmt[:8])
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV decodable without codec libs "
            f"(got fmt={audio_fmt}, bits={bits})"
        )
    return np.frombuffer(data, "<i2").reshape(-1, n_ch).copy(), rate
