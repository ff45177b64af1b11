"""Multimodal plumbing: schemas, Arrow batch iteration, 1->N frame
expansion, determinism across partitionings; the decode stub's
NotImplementedError gate."""

import numpy as np
import pytest

from moamosaic_spark.operators import multimodal as MM


def test_image_features_deterministic_across_partitionings(spark):
    media = MM.synth_media(spark, n=16)
    a = {r.media_id: r for r in MM.image_features(media).collect()}
    b = {r.media_id: r for r in MM.image_features(media.repartition(7)).collect()}
    assert set(a) == set(b) and len(a) == 8  # half the rows are images
    for k in a:
        assert a[k].mean_intensity == b[k].mean_intensity
        assert a[k].phash == b[k].phash


def test_resize_shape_and_determinism(spark):
    media = MM.synth_media(spark, n=8)
    rows = MM.resize_images(media, 16, 12).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.width, r.height) == (16, 12)
        assert len(r.pixels) == 16 * 12
    rows2 = MM.resize_images(media, 16, 12).collect()
    assert {r.media_id: list(r.pixels) for r in rows} == {
        r.media_id: list(r.pixels) for r in rows2
    }


def test_frame_sampling_expansion(spark):
    media = MM.synth_media(spark, n=8)
    rows = MM.sample_frames(media, every_n=10).collect()
    vids = {r.media_id for r in rows}
    assert len(vids) == 2  # kinds cycle image,image,audio,video
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_vid.values():
        assert sorted(idxs) == [0, 10, 20]
    # different frames of one video decode differently
    one = [r for r in rows if r.media_id == sorted(vids)[0]]
    vals = {r.mean_intensity for r in one}
    assert len(vals) == len(one)


def test_undecodable_format_is_gated():
    """Non-BMP/PPM payloads still gate loudly without fake=True."""
    with pytest.raises(NotImplementedError, match="codec libs"):
        MM.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8, 4, 4, 3, fake=False)
    with pytest.raises(NotImplementedError, match="codec libs"):
        MM.decode_audio(b"\x00" * 16, 16000, fake=False)


def test_fake_decode_payload_sensitivity():
    a = MM.decode_image(b"payload-a", 8, 8, 3, fake=True)
    b = MM.decode_image(b"payload-b", 8, 8, 3, fake=True)
    a2 = MM.decode_image(b"payload-a", 8, 8, 3, fake=True)
    assert a.shape == (8, 8, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, a2)
    assert (a != b).any()


# ---------------------------------------------------------------------------
# Real pure-numpy codecs (operators/codecs.py)
# ---------------------------------------------------------------------------

from moamosaic_spark.operators import codecs as C  # noqa: E402


@pytest.mark.parametrize("w,h", [(8, 6), (7, 5), (1, 1), (13, 3)])
def test_bmp_roundtrip_including_row_padding(w, h):
    """encode->decode must be bit-exact, incl. odd widths whose BMP
    rows carry 4-byte alignment padding."""
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(C.decode_bmp(C.encode_bmp(img)), img)


def test_bmp_top_down_and_paletted():
    """Negative height = top-down row order; 8-bit payloads map through
    the BGRA palette."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    enc = bytearray(C.encode_bmp(img))
    # flip height sign -> top-down; rows were written bottom-up, so the
    # decoder must now return them flipped
    import struct
    enc[22:26] = struct.pack("<i", -2)
    np.testing.assert_array_equal(C.decode_bmp(bytes(enc)), img[::-1])

    # hand-built 8-bit paletted BMP: 2x2, palette entry i = (i, 0, 255-i) BGR
    pal = b"".join(bytes([i, 0, 255 - i, 0]) for i in range(256))
    rows = bytes([10, 20, 0, 0]) + bytes([30, 40, 0, 0])  # padded to 4
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 1024 + 8, 0, 0, 14 + 40 + 1024)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 0, 0)
    img8 = C.decode_bmp(hdr + info + pal + rows)
    # bottom-up: first stored row is the BOTTOM row
    np.testing.assert_array_equal(img8[1, 0], [255 - 10, 0, 10])  # RGB
    np.testing.assert_array_equal(img8[0, 1], [255 - 40, 0, 40])


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    np.testing.assert_array_equal(
        C.decode_ppm(C.encode_ppm(gray))[:, :, 0], gray
    )
    # header comments + arbitrary whitespace per the netpbm spec
    wild = b"P6 # inline comment\n# full line\n 7\t4 \n255\n" + img.tobytes()
    np.testing.assert_array_equal(C.decode_ppm(wild), img)


def test_wav_roundtrip_and_extra_chunk():
    rng = np.random.default_rng(6)
    mono = rng.integers(-3000, 3000, size=500, dtype=np.int16)
    got, rate = C.decode_wav(C.encode_wav(mono, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(got[:, 0], mono)
    stereo = rng.integers(-3000, 3000, size=(200, 2), dtype=np.int16)
    got2, rate2 = C.decode_wav(C.encode_wav(stereo, 44100))
    assert rate2 == 44100
    np.testing.assert_array_equal(got2, stereo)
    # an extra LIST chunk between fmt and data must be skipped
    enc = C.encode_wav(mono, 8000)
    import struct
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"hello" + b"\x00"  # odd size -> pad
    spliced = enc[:fmt_end] + extra + enc[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got3, _ = C.decode_wav(spliced)
    np.testing.assert_array_equal(got3[:, 0], mono)


def test_decode_image_meta_mismatch_raises():
    img = np.zeros((4, 6, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="meta declares"):
        MM.decode_image(C.encode_bmp(img), width=6, height=5, channels=3)


def test_image_features_real_payloads_golden(spark):
    """With real BMP/PPM payloads the pipeline's features must equal
    numpy computed directly on the SOURCE arrays — true end-to-end
    decode, no stub anywhere (fake_decode=False)."""
    media = MM.synth_media(spark, n=16, seed=7, real_payloads=True)
    # reconstruct the same source images the generator minted
    rng = np.random.default_rng(7)
    want = {}
    for i in range(16):
        kind = ["image", "image", "audio", "video"][i % 4]
        w, h = 64 + 8 * (i % 5), 48 + 8 * (i % 3)
        if kind == "video":
            rng.integers(0, 256, size=(30, h, w), dtype=np.uint8)
            continue
        if kind == "image":
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            want[f"m{i:04d}"] = img
        else:
            np.arange(1600)
            rng.integers(-256, 256, size=1600)
    got = {r.media_id: r for r in MM.image_features(media, fake_decode=False).collect()}
    assert set(got) == set(want)
    for mid, img in want.items():
        assert got[mid].mean_intensity == pytest.approx(float(img.mean()))
        assert got[mid].std_intensity == pytest.approx(float(img.std()))


def test_audio_features_real_wav(spark):
    """audio_features over real WAV payloads: exact duration and RMS vs
    the regenerated source signal."""
    media = MM.synth_media(spark, n=16, seed=7, real_payloads=True)
    rng = np.random.default_rng(7)
    want = {}
    for i in range(16):
        kind = ["image", "image", "audio", "video"][i % 4]
        w, h = 64 + 8 * (i % 5), 48 + 8 * (i % 3)
        if kind == "video":
            rng.integers(0, 256, size=(30, h, w), dtype=np.uint8)
        elif kind == "image":
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        else:
            t = np.arange(1600)
            sig = 4000 * np.sin(2 * np.pi * (110 + 13 * i) * t / 16000)
            sig = (sig + rng.integers(-256, 256, size=t.shape)).astype(np.int16)
            want[f"m{i:04d}"] = sig
    got = {r.media_id: r for r in MM.audio_features(media).collect()}
    assert set(got) == set(want)
    for mid, sig in want.items():
        r = got[mid]
        assert (r.sample_rate, r.n_samples) == (16000, 1600)
        assert r.duration_s == pytest.approx(0.1)
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(sig.astype(np.float64) ** 2))))


def test_video_fake_gate_for_opaque_payloads(spark):
    """Opaque (non-Y4M) video payloads need the fake path; with
    fake_decode=False they must raise, not silently fabricate."""
    media = MM.synth_media(spark, n=8, real_payloads=False)
    rows = MM.sample_frames(media, every_n=10, fake_decode=True).collect()
    assert {r.frame_idx for r in rows} == {0, 10, 20}
    with pytest.raises(Exception, match="codec libs|NotImplementedError"):
        MM.sample_frames(media, every_n=10, fake_decode=False).collect()


def test_unsupported_variant_honors_fake_contract():
    """A recognized container with an unsupported VARIANT (RLE BMP,
    float32 WAV) must still honor fake=True — the stub, never a raise
    that kills the whole mapInPandas job; without fake it raises."""
    import struct

    hdr = struct.pack("<2sIHHI", b"BM", 100, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 1, 0, 0, 0, 0, 0)  # RLE
    rle_bmp = hdr + info + b"\x00" * 32
    with pytest.raises(NotImplementedError):
        MM.decode_image(rle_bmp, 4, 4, 3, fake=False)
    arr = MM.decode_image(rle_bmp, 4, 4, 3, fake=True)
    assert arr.shape == (4, 4, 3) and arr.dtype == np.uint8

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32 PCM
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        MM.decode_audio(wav, 8000, fake=False)
    s, r = MM.decode_audio(wav, 8000, fake=True)
    assert r == 8000 and s.shape[1] == 1 and s.dtype == np.int16


def test_y4m_roundtrip_and_variants():
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    got, fps = C.decode_y4m(C.encode_y4m(frames, fps=(30, 1)))
    assert fps == (30, 1)
    np.testing.assert_array_equal(got, frames)
    for cs in ("444", "mono"):
        got2, _ = C.decode_y4m(C.encode_y4m(frames, colorspace=cs))
        np.testing.assert_array_equal(got2, frames)
    # unsupported colorspace gates loudly
    enc = C.encode_y4m(frames).replace(b"C420", b"C422")
    with pytest.raises(NotImplementedError, match="C422"):
        C.decode_y4m(enc)


def test_sample_frames_real_y4m_golden(spark):
    """Real Y4M video end-to-end: sampled frame means equal numpy on
    the regenerated source frames, with fake_decode=False."""
    media = MM.synth_media(spark, n=8, seed=7, real_payloads=True)
    rng = np.random.default_rng(7)
    want = {}
    for i in range(8):
        kind = ["image", "image", "audio", "video"][i % 4]
        w, h = 64 + 8 * (i % 5), 48 + 8 * (i % 3)
        if kind == "video":
            frames = rng.integers(0, 256, size=(30, h, w), dtype=np.uint8)
            want[f"m{i:04d}"] = frames
        elif kind == "image":
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        else:
            np.arange(1600)
            rng.integers(-256, 256, size=1600)
    rows = MM.sample_frames(media, every_n=10, fake_decode=False).collect()
    assert {r.media_id for r in rows} == set(want)
    for r in rows:
        assert r.mean_intensity == pytest.approx(
            float(want[r.media_id][r.frame_idx].mean())
        )


def test_video_neardup_pairs_real_y4m(spark):
    """Video near-dup: a clip sharing most frames with another (e.g. a
    re-containered copy with a few frames changed) pairs up by
    frame-hash Jaccard; unrelated clips do not. Frames decode for real
    (Y4M), hashes via the image pipeline's average-hash."""
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(20, 32, 32), dtype=np.uint8)
    variant = base.copy()
    variant[18:] = rng.integers(0, 256, size=(2, 32, 32), dtype=np.uint8)
    other = rng.integers(0, 256, size=(20, 32, 32), dtype=np.uint8)
    rows = [
        {"media_id": mid, "kind": "video",
         "payload": bytearray(C.encode_y4m(fr)),
         "meta": {"width": 32, "height": 32, "channels": 1,
                  "sample_rate": 0, "n_frames": fr.shape[0]}}
        for mid, fr in [("va", base), ("vb", variant), ("vc", other)]
    ]
    media = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in MM.video_neardup_pairs(media, threshold=0.5).collect()}
    assert ("va", "vb") in pairs and pairs[("va", "vb")] >= 0.8
    assert all({"vc"} - set(k) for k in pairs), pairs  # vc pairs with nobody

    # postings are deterministic + distinct per (video, frame hash)
    ph = MM.video_frame_hashes(media).collect()
    assert len(ph) == len({(r.doc_id, r.shingle) for r in ph})


def test_bmp_short_palette_and_zero_offset():
    """biClrUsed < 256: the palette read must be sized by the header
    (a fixed 1024-byte read overruns into pixel data / past EOF), and
    a zero bfOffBits means pixels start right after the actual-size
    palette."""
    import struct
    # 2x2 8-bit BMP with a 16-entry palette: entry i = (i*16, i, 0) BGR
    pal = b"".join(bytes([i * 16, i, 0, 0]) for i in range(16))
    rows = bytes([3, 7, 0, 0]) + bytes([11, 15, 0, 0])  # padded to 4
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 16, 0)
    # explicit bfOffBits
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 64 + 8, 0, 0, 14 + 40 + 64)
    img = C.decode_bmp(hdr + info + pal + rows)
    np.testing.assert_array_equal(img[1, 0], [0, 3, 3 * 16])   # RGB of idx 3
    np.testing.assert_array_equal(img[0, 1], [0, 15, 15 * 16])
    # bfOffBits = 0: decoder must derive 14 + hdr + 4*biClrUsed
    hdr0 = struct.pack("<2sIHHI", b"BM", 14 + 40 + 64 + 8, 0, 0, 0)
    np.testing.assert_array_equal(C.decode_bmp(hdr0 + info + pal + rows), img)
    # the file ends at the palette+pixels — the old fixed 1024-byte
    # palette read raised ValueError from np.frombuffer here


def test_fake_true_survives_corrupt_recognized_magic():
    """A payload whose magic sniffs as BMP/RIFF/Y4M but whose body is
    truncated must fall through to the pseudo-decode under fake=True
    (one bad row must not kill the mapInPandas job) and still raise
    under fake=False."""
    bad_bmp = b"BM" + b"\x00" * 40          # truncated: frombuffer fails
    bad_wav = b"RIFF\x10\x00\x00\x00WAVE"   # no fmt/data chunks
    bad_y4m = b"YUV4MPEG2 W8 H8 F25:1 C420\nFRAME\n\x01\x02"  # short frame
    out = MM.decode_image(bad_bmp, 4, 4, 3, fake=True)
    assert out.shape == (4, 4, 3)
    samples, rate = MM.decode_audio(bad_wav, 8000, fake=True)
    assert rate == 8000 and samples.dtype == np.int16
    frames = MM.decode_video(bad_y4m, 8, 8, 2, fake=True)
    assert frames.shape == (2, 8, 8)
    with pytest.raises((ValueError, NotImplementedError)):
        MM.decode_image(bad_bmp, 4, 4, 3, fake=False)
    with pytest.raises((ValueError, NotImplementedError)):
        MM.decode_audio(bad_wav, 8000, fake=False)
    with pytest.raises((ValueError, NotImplementedError)):
        MM.decode_video(bad_y4m, 8, 8, 2, fake=False)


def test_audio_neardup_pairs_real_wav(spark):
    """Audio near-dup via chunk-hash postings: a copy with its last
    quarter replaced pairs with its base above 0.5; unrelated clips
    pair with nobody; postings computed from SOURCE signals equal the
    decoded ones (WAV round-trip is bit-exact)."""
    media = MM.synth_audio_clips(spark, seed=29)
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in MM.audio_neardup_pairs(media, threshold=0.5).collect()}
    assert set(pairs) == {("b0", "v0"), ("b1", "v1"), ("b2", "v2")}, pairs
    assert all(abs(j - 0.6) < 1e-9 for j in pairs.values()), pairs
    got = {(r.doc_id, r.shingle) for r in MM.audio_chunk_hashes(media).collect()}
    assert got == set(MM.audio_truth_postings(seed=29))
