"""CLI surface: the reference's ``moamosaic`` command re-targeted at
tables — plain mosaic, batched/resumable runs, same-CRS rescale and
cross-CRS warp, monitor JSON."""

import json

import numpy as np
import pytest

from moamosaic_spark.cli import main
from moamosaic_spark.sources import synth
from tests.conftest import to_blocks, to_footprints


@pytest.fixture()
def staged(spark, tmp_path):
    rasters = synth.grid3x3(150, 150)
    fp = to_footprints(spark, synth.footprints_pdf(rasters))
    blocks = to_blocks(spark, synth.blocks_pdf(rasters, 64))
    fp.write.mode("overwrite").parquet(str(tmp_path / "fp"))
    blocks.write.mode("overwrite").parquet(str(tmp_path / "blocks"))
    return tmp_path


def _canvas(spark, out):
    tiles = spark.read.parquet(f"{out}/tiles").collect()
    assert tiles
    return tiles


def test_cli_plain_mosaic(spark, staged):
    out = str(staged / "out_plain")
    main([
        "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
        "-o", out, "-b", "64", "--src-blocksize", "64", "--no-overviews",
        "--monitorjson", str(staged / "mon.json"),
    ])
    tiles = _canvas(spark, out)
    assert spark.read.parquet(f"{out}/stats").count() == 1
    mon = json.loads((staged / "mon.json").read_text())
    assert "domosaic" in mon["total_by_name"]
    # matches the oracle
    rasters = synth.grid3x3(150, 150)
    want = synth.oracle(rasters, blocksize=64, min_overview_size=9999)
    for r in tiles:
        arr = np.asarray(r.pixels, dtype=np.int32).reshape(r.ysize, r.xsize)
        np.testing.assert_array_equal(arr, want.tiles[(r.band, r.tile_row, r.tile_col)])


def test_cli_batched_resume(spark, staged):
    out = str(staged / "out_batched")
    main([
        "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
        "-o", out, "-b", "64", "--src-blocksize", "64", "--no-overviews",
        "--batches", "3",
    ])
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.where("status = 'done'").count() == 3
    _canvas(spark, out)


def test_cli_rescale_and_warp(spark, staged):
    out1 = str(staged / "out_rescale")
    main([
        "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
        "-o", out1, "-b", "64", "--src-blocksize", "64", "--no-overviews",
        "--xres", "20", "--yres", "20", "--resample", "average",
    ])
    _canvas(spark, out1)
    out2 = str(staged / "out_warp")
    main([
        "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
        "-o", out2, "-b", "64", "--src-blocksize", "64", "--no-overviews",
        "--out-epsg", "32755",
    ])
    _canvas(spark, out2)


def test_cli_rejects_bad_args(staged):
    with pytest.raises(SystemExit):
        main(["--blocks", str(staged / "blocks"), "-o", "/tmp/x"])  # no inputs
    with pytest.raises(SystemExit):
        main([
            "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
            "-o", "/tmp/x", "--resample", "cubic",
        ])
