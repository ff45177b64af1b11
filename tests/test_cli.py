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


def test_cli_relayout_reuse(spark, staged):
    """--relayout-table builds the bucketed work table on first use and
    stitches off it on the second run (monitor shows no rebuild); both
    outputs equal the plain run."""
    out1 = str(staged / "out_rel1")
    out2 = str(staged / "out_rel2")
    base = [
        "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
        "-b", "64", "--src-blocksize", "64", "--no-overviews",
        "--relayout-table", "cli_relayout_t",
    ]
    main(base + ["-o", out1, "--monitorjson", str(staged / "m1.json")])
    main(base + ["-o", out2, "--monitorjson", str(staged / "m2.json")])
    m1 = json.loads((staged / "m1.json").read_text())
    m2 = json.loads((staged / "m2.json").read_text())
    assert "relayout_build" in m1["total_by_name"]
    assert "relayout_build" not in m2["total_by_name"]  # reused
    rasters = synth.grid3x3(150, 150)
    want = synth.oracle(rasters, blocksize=64, min_overview_size=9999)
    for out in (out1, out2):
        for r in _canvas(spark, out):
            arr = np.asarray(r.pixels, dtype=np.int32).reshape(r.ysize, r.xsize)
            np.testing.assert_array_equal(
                arr, want.tiles[(r.band, r.tile_row, r.tile_col)])
    spark.sql("DROP TABLE IF EXISTS cli_relayout_t")
    spark.sql("DROP TABLE IF EXISTS cli_relayout_t_meta")


def test_cli_relayout_batches_exclusive(staged):
    with pytest.raises(SystemExit):
        main([
            "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
            "-o", str(staged / "x"), "--relayout-table", "t", "--batches", "3",
        ])


def test_cli_derived_products(spark, staged):
    """--derived writes gdaldem-style products; hillshade must equal a
    direct hillshade over the written tiles, basins must partition the
    defined cells."""
    from moamosaic_spark.functions.focal import hillshade

    out = str(staged / "out_derived")
    main([
        "--footprints", str(staged / "fp"), "--blocks", str(staged / "blocks"),
        "-o", out, "-b", "64", "--src-blocksize", "64", "--no-overviews",
        "--derived", "hillshade", "--derived", "terrain",
        "--derived", "basins",
    ])
    tiles = spark.read.parquet(f"{out}/tiles").select(
        "band", "tile_row", "tile_col", "ysize", "xsize", "pixels")
    want = {
        (r.band, r.tile_row, r.tile_col): np.asarray(r.pixels, np.int64)
        for r in hillshade(tiles, xres=10.0, yres=10.0, nullval=0).collect()
    }
    got = {
        (r.band, r.tile_row, r.tile_col): np.asarray(r.pixels, np.int64)
        for r in spark.read.parquet(f"{out}/hillshade").collect()
    }
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    terr = spark.read.parquet(f"{out}/terrain")
    assert {"slope_q", "d8"} <= set(terr.columns) and terr.count() > 0
    basins = spark.read.parquet(f"{out}/basins")
    n_def = terr.selectExpr(
        "sum(size(filter(d8, x -> x != -1))) AS n").collect()[0].n
    assert basins.count() == n_def


def test_cli_derived_rejects_batches(staged):
    with pytest.raises(SystemExit):
        main([
            "--footprints", str(staged / "fp"),
            "--blocks", str(staged / "blocks"),
            "-o", str(staged / "x"), "-b", "64", "--batches", "2",
            "--derived", "hillshade",
        ])
