"""Merge policies: 'last' is the reference's filelist-order rule (the
golden default — tested everywhere else); 'nearest' is the kNN
nearest-source tie-breaking extension. Verified against an independent
full-canvas numpy oracle; both kernels must agree."""

import numpy as np
import pytest

from moamosaic_spark.mosaic import MosaicConfig, do_mosaic
from moamosaic_spark.sources import synth
from tests.conftest import to_blocks, to_footprints


def nearest_oracle(rasters, grid, nullval=0):
    canvas = np.full((grid.nrows, grid.ncols), nullval, dtype=np.int32)
    best = np.full(canvas.shape, np.inf)
    for r in rasters:
        row0 = int(round((grid.y_max - r.y0) / grid.y_res))
        col0 = int(round((r.x0 - grid.x_min) / grid.x_res))
        arr = r.bands[0]
        cy, cx = row0 + (r.nrows - 1) / 2.0, col0 + (r.ncols - 1) / 2.0
        rr = np.arange(row0, row0 + r.nrows)[:, None] - cy
        cc = np.arange(col0, col0 + r.ncols)[None, :] - cx
        dist = rr * rr + cc * cc
        sub_c = canvas[row0: row0 + r.nrows, col0: col0 + r.ncols]
        sub_b = best[row0: row0 + r.nrows, col0: col0 + r.ncols]
        mask = (arr != nullval) & (dist <= sub_b)
        sub_c[mask] = arr[mask]
        sub_b[mask] = dist[mask]
    return canvas


@pytest.mark.parametrize("kernel", ["arrow", "pandas"])
def test_nearest_policy_matches_oracle(spark, kernel):
    rasters = synth.grid3x3(120, 120, overlap=40)  # big overlaps
    fp = to_footprints(spark, synth.footprints_pdf(rasters))
    blocks = to_blocks(spark, synth.blocks_pdf(rasters, 256))
    cfg = MosaicConfig(
        blocksize=64, src_blocksize=256, with_overviews=False,
        merge_policy="nearest", kernel=kernel,
    )
    res = do_mosaic(spark, fp, blocks, cfg)
    grid = res.grid
    want = nearest_oracle(rasters, grid)

    got = np.full((grid.nrows, grid.ncols), -1, dtype=np.int32)
    for r in res.tiles.collect():
        got[r.y_off: r.y_off + r.ysize, r.x_off: r.x_off + r.xsize] = np.asarray(
            r.pixels, dtype=np.int32
        ).reshape(r.ysize, r.xsize)
    np.testing.assert_array_equal(got, want)

    # and it actually differs from last-wins in the overlap bands
    last = synth.oracle(rasters, blocksize=64, min_overview_size=9999).canvas[1]
    assert (want != last).any()


def test_nearest_equal_distance_falls_back_to_last(spark):
    """Two identical-footprint rasters: all distances equal -> the
    later (higher-priority) source wins everywhere it is non-null,
    exactly like 'last'."""
    r0 = synth.make_rasters(
        [dict(media_ref="r000", x0=300000.0, y0=7000000.0, nrows=64, ncols=64)]
    )[0]
    r1 = synth.make_rasters(
        [dict(media_ref="r001", x0=300000.0, y0=7000000.0, nrows=64, ncols=64)]
    )[0]
    r1.bands[0] = r1.bands[0] + 1000  # distinguishable values, none null
    rasters = [r0, r1]
    fp = to_footprints(spark, synth.footprints_pdf(rasters))
    blocks = to_blocks(spark, synth.blocks_pdf(rasters, 256))
    cfg = MosaicConfig(blocksize=64, src_blocksize=256, with_overviews=False,
                       merge_policy="nearest")
    res = do_mosaic(spark, fp, blocks, cfg)
    arr = np.asarray(res.tiles.collect()[0].pixels, dtype=np.int32).reshape(64, 64)
    np.testing.assert_array_equal(arr, r1.bands[0])
