"""Output-grid planning: extent aggregate, remainder-absorbing tiling,
overview-level plan, and hierarchical cell indexing.

Replicates, as declarative Spark relations:

* global extent aggregate      — ref /root/reference/moamosaic/mosaic.py:429-456
* block decomposition (tiling) — ref mosaic.py:459-487 (the ``blocksize//4``
  remainder-absorption rule is replicated exactly; see :func:`n_blocks`)
* overview-level plan          — ref mosaic.py:646-658
* cell index                   — S2/H3-style space-filling-curve ids used as
  the shuffle key of the spatial join (Morton/Z-order interleave; the
  reference has no such index — its join is a nested loop, mosaic.py:501-535)

Everything here is pure column arithmetic — no UDFs, fully
whole-stage-codegen'd, and the tile relation is generated distributed via
``spark.range`` so a 100 TB mosaic's tile table never materializes on the
driver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class OutputGrid:
    """Analog of the reference's output ImageInfo (mosaic.py:429-456)."""

    x_min: float
    y_max: float
    x_res: float
    y_res: float
    ncols: int
    nrows: int
    n_bands: int
    nullval: float
    dtype: str
    projection: str

    @property
    def transform(self) -> tuple:
        # GDAL-convention geotransform of the output grid
        return (self.x_min, self.x_res, 0.0, self.y_max, 0.0, -self.y_res)


def make_output_grid(footprints: DataFrame, nullval: float | None = None) -> OutputGrid:
    """Global extent aggregate (A1). One tiny all-reduce over the footprint
    dim table; projection/res/dtype/bands/null default from the
    priority-0 (first) input, exactly as ref mosaic.py:442-455.
    """
    row = (
        footprints.agg(
            F.min(F.col("x0")).alias("x_min"),
            F.max(F.col("x0") + F.col("ncols") * F.col("x_res")).alias("x_max"),
            F.min(F.col("y0") - F.col("nrows") * F.col("y_res")).alias("y_min"),
            F.max(F.col("y0")).alias("y_max"),
            F.min_by(
                F.struct("x_res", "y_res", "n_bands", "nullval", "dtype", "projection"),
                F.col("priority"),
            ).alias("first"),
        )
    ).collect()[0]
    if row["first"] is None:
        raise ValueError(
            "no media footprints found — the documents table has no media "
            "spans (or the footprints table is empty)"
        )
    first = row["first"]
    x_res, y_res = float(first["x_res"]), float(first["y_res"])
    # int(round(...)) as in ref mosaic.py:446-447
    ncols = int(round((row["x_max"] - row["x_min"]) / x_res))
    nrows = int(round((row["y_max"] - row["y_min"]) / y_res))
    nv = float(first["nullval"]) if nullval is None else float(nullval)
    return OutputGrid(
        x_min=float(row["x_min"]),
        y_max=float(row["y_max"]),
        x_res=x_res,
        y_res=y_res,
        ncols=ncols,
        nrows=nrows,
        n_bands=int(first["n_bands"]),
        nullval=nv,
        dtype=str(first["dtype"]),
        projection=str(first["projection"]),
    )


def n_blocks(n: int, blocksize: int) -> int:
    """Closed form of the reference's sequential tiling loop
    (mosaic.py:459-487): blocks of ``blocksize`` except the last, which
    absorbs a remainder smaller than ``blocksize//4``.

    Derivation: the loop emits full blocks at tops 0, bs, 2bs, ... and
    the k-th block (0-based) is the last iff the remainder after it,
    n - (k+1)*bs, is strictly < bs//4 — i.e. the block count is the
    smallest k with n - k*bs < bs//4, which is floor((n - bs//4)/bs) + 1,
    clamped to >= 1. Verified against a literal re-simulation of the
    reference loop in tests/test_grid.py.
    """
    if n <= 0:
        return 0
    bs = blocksize
    return max(1, math.floor((n - bs // 4) / bs) + 1)


def block_edges(n: int, blocksize: int) -> list[tuple[int, int]]:
    """Driver-side (top/left, size) list — small; used by oracles/tests."""
    nb = n_blocks(n, blocksize)
    out = []
    for i in range(nb):
        start = i * blocksize
        size = blocksize if i < nb - 1 else n - start
        out.append((start, size))
    return out


def make_tile_relation(
    spark: SparkSession, grid: OutputGrid, blocksize: int
) -> DataFrame:
    """O1: the output-tile relation, generated distributed.

    Columns: tile_row, tile_col, top, left, ysize, xsize.

    ``spark.range(nb_r * nb_c)`` + pure column math — at 100 TB scale the
    tile table is millions of rows and never touches the driver.
    """
    nb_r = n_blocks(grid.nrows, blocksize)
    nb_c = n_blocks(grid.ncols, blocksize)
    bs = blocksize
    t = spark.range(nb_r * nb_c).select(
        (F.col("id") / nb_c).cast("int").alias("tile_row"),
        (F.col("id") % nb_c).cast("int").alias("tile_col"),
    )
    return t.select(
        "tile_row",
        "tile_col",
        (F.col("tile_row") * bs).alias("top"),
        (F.col("tile_col") * bs).alias("left"),
        F.when(F.col("tile_row") < nb_r - 1, F.lit(bs))
        .otherwise(F.lit(grid.nrows - (nb_r - 1) * bs))
        .cast("int")
        .alias("ysize"),
        F.when(F.col("tile_col") < nb_c - 1, F.lit(bs))
        .otherwise(F.lit(grid.ncols - (nb_c - 1) * bs))
        .cast("int")
        .alias("xsize"),
    )


def overview_levels(nrows: int, ncols: int, min_overview_size: int) -> list[int]:
    """W1: levels 4, 8, 16, ... while max-dim // 2**i >= min size
    (ref mosaic.py:646-658)."""
    out_size = max(nrows, ncols)
    levels = []
    i = 2
    while (out_size // (2**i)) >= min_overview_size:
        levels.append(2**i)
        i += 1
    return levels


def overview_shape(nrows: int, ncols: int, lvl: int) -> tuple[int, int]:
    """Shape of the strided subsample ``arr[lvl//2::lvl, lvl//2::lvl]``
    (ref mosaic.py:732-734, tests.py:158-160)."""
    o = lvl // 2
    nr = 0 if nrows <= o else (nrows - o + lvl - 1) // lvl
    nc = 0 if ncols <= o else (ncols - o + lvl - 1) // lvl
    return (nr, nc)


# ---------------------------------------------------------------------------
# Cell index (S2/H3-style): Morton / Z-order interleave of cell coords.
# ---------------------------------------------------------------------------

MORTON_BITS = 32  # supports cell grids up to 2^32 x 2^32 per axis


def morton_expr(cx, cy):
    """Interleave the low 32 bits of integer columns cx, cy into a single
    64-bit Z-order cell id — pure JVM-side bit arithmetic (no UDF), the
    classic Morton magic-number spread. 32 bits/axis covers a
    10^12-document footprint catalog at any sane cell size.
    MUST stay bit-identical to driver_contract._morton_sql (the DuckDB
    oracle rendering).
    """
    def spread(c):
        # spread 32 bits to even positions via magic-number shifts
        # (bitwiseOR/AND: PySpark's | and & on Columns are boolean ops)
        v = c.cast("long")
        v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
        v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
        return v

    return spread(cx).bitwiseOR(F.shiftleft(spread(cy), 1)).alias("cell_id")


def cell_coords_expr(x_world, y_world, cell_size: float, x_origin: float, y_origin: float):
    """World coords -> integer cell coords on a fixed cell grid anchored at
    (x_origin, y_origin); y grows downward (raster convention)."""
    cx = F.floor((x_world - F.lit(x_origin)) / F.lit(cell_size)).cast("long")
    cy = F.floor((F.lit(y_origin) - y_world) / F.lit(cell_size)).cast("long")
    return cx, cy


def with_cell_id(df: DataFrame, x_col: str, y_col: str, cell_size: float,
                 x_origin: float, y_origin: float) -> DataFrame:
    cx, cy = cell_coords_expr(F.col(x_col), F.col(y_col), cell_size, x_origin, y_origin)
    return df.withColumn("cell_id", morton_expr(cx, cy))


def global_pixel_index(pos, blocksize: int, g_ncols: int,
                       tile_row=None, tile_col=None, xsize=None):
    """Column expression: global row-major pixel index (r * g_ncols + c)
    of element ``pos`` of a tile's row-major pixel array.

    This is THE tiling contract in one place: valid because the
    remainder-absorbing tiling (make_tile_relation) keeps t_top =
    tile_row * blocksize and t_left = tile_col * blocksize for every
    tile including the absorbed last one, so position reconstructs
    from the tile key + xsize alone."""
    tile_row = F.col("tile_row") if tile_row is None else tile_row
    tile_col = F.col("tile_col") if tile_col is None else tile_col
    xsize = F.col("xsize") if xsize is None else xsize
    r = tile_row.cast("long") * blocksize + F.floor(pos / xsize).cast("long")
    c = tile_col.cast("long") * blocksize + (pos % xsize).cast("long")
    return r * g_ncols + c
