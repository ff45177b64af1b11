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


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="codecs unavailable"):
        MM.decode_image(b"\x00" * 8, 4, 4, 3, fake=False)


def test_fake_decode_payload_sensitivity():
    a = MM.decode_image(b"payload-a", 8, 8, 3, fake=True)
    b = MM.decode_image(b"payload-b", 8, 8, 3, fake=True)
    a2 = MM.decode_image(b"payload-a", 8, 8, 3, fake=True)
    assert a.shape == (8, 8, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, a2)
    assert (a != b).any()
