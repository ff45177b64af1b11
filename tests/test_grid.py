"""Unit tests for planning relations: tiling (incl. the remainder-absorbing
rule, ref mosaic.py:459-487), extent aggregate, overview plan, Morton cells."""

import numpy as np
import pytest

from moamosaic_spark.plans import grid as G
from moamosaic_spark.sources import synth
from tests.conftest import to_footprints


@pytest.mark.parametrize("blocksize", [64, 100, 256, 1024])
@pytest.mark.parametrize(
    "n", [1, 10, 63, 64, 65, 100, 255, 256, 257, 300, 1023, 1024, 1025, 1090, 1100, 5000]
)
def test_tiling_closed_form_matches_reference_loop(n, blocksize):
    assert G.block_edges(n, blocksize) == synth._tiling_loop(n, blocksize)


def test_tile_relation_matches_block_edges(spark):
    rasters = synth.golden_pair(nrows=300, ncols=300)
    fp = to_footprints(spark, synth.footprints_pdf(rasters))
    grid = G.make_output_grid(fp)
    tiles = G.make_tile_relation(spark, grid, 128).collect()
    want = {
        (ti, tj, top, left, ys, xs)
        for ti, (top, ys) in enumerate(G.block_edges(grid.nrows, 128))
        for tj, (left, xs) in enumerate(G.block_edges(grid.ncols, 128))
    }
    got = {
        (r.tile_row, r.tile_col, r.top, r.left, r.ysize, r.xsize) for r in tiles
    }
    assert got == want


def test_output_grid_matches_oracle(spark):
    for rasters in [synth.golden_pair(128, 128), synth.grid3x3(100, 100), synth.with_gap()]:
        fp = to_footprints(spark, synth.footprints_pdf(rasters))
        grid = G.make_output_grid(fp)
        want = synth.oracle(rasters, blocksize=64, min_overview_size=32).grid
        assert (grid.x_min, grid.y_max, grid.ncols, grid.nrows) == (
            want.x_min,
            want.y_max,
            want.ncols,
            want.nrows,
        )
        assert grid.nullval == want.nullval
        assert grid.n_bands == want.n_bands


def test_overview_levels():
    # ref mosaic.py:646-658: levels 4,8,... while max_dim // 2**i >= minsize
    assert G.overview_levels(5000, 9998, 1024) == [4, 8]
    assert G.overview_levels(512, 512, 1024) == []
    assert G.overview_levels(100000, 100, 1024) == [4, 8, 16, 32, 64]


def test_overview_shape_matches_numpy_stride():
    rng = np.random.default_rng(0)
    for _ in range(50):
        nr = int(rng.integers(1, 3000))
        nc = int(rng.integers(1, 3000))
        lvl = int(2 ** rng.integers(2, 7))
        o = lvl // 2
        arr = np.zeros((nr, nc), dtype=np.uint8)
        assert G.overview_shape(nr, nc, lvl) == arr[o::lvl, o::lvl].shape


def test_morton_cell_id_injective(spark):
    import pyspark.sql.functions as F

    df = spark.range(0, 1 << 12).select(
        (F.col("id") % 64).alias("cx"), (F.col("id") / 64).cast("long").alias("cy")
    )
    out = df.select(G.morton_expr(F.col("cx"), F.col("cy"))).distinct().count()
    assert out == 1 << 12


def test_morton_matches_python_reference(spark):
    """Spark expr == a literal-python Morton interleave, including
    coords beyond 16 bits (the 10^12-scale regime)."""
    import pyspark.sql.functions as F

    def morton_py(x, y):
        out = 0
        for b in range(32):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    coords = [(0, 0), (1, 0), (0, 1), (12345, 67), (65535, 65535),
              (65536, 1), (1 << 20, (1 << 19) + 3), ((1 << 31) - 1, 7)]
    df = spark.createDataFrame(coords, "cx long, cy long")
    got = {
        (r.cx, r.cy): r.cell_id
        for r in df.select("cx", "cy", G.morton_expr(F.col("cx"), F.col("cy"))).collect()
    }
    for (x, y), v in got.items():
        assert v == morton_py(x, y), (x, y)
