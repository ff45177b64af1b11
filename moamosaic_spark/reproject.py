"""S4/P8-P11 — the reprojection path.

Reference behavior (reproj.py:14-59): if an output projection or pixel
size is requested, each input is wrapped in a lazy VRT that warps to the
target grid at read time; otherwise inputs are validated for agreement.
Spark rebuild:

* agreement validation (P6/P7)  -> mosaic.validate_projections
* grid snap (P9, reproj.py:237-261)         -> snap_value / align_grid
* corner envelope (P10, reproj.py:221-234)  -> reproject_corners
  (pyproj-backed; gated — this container has no pyproj, and the
  reference's own golden test is same-projection)
* resolution change, same CRS (the common mosaic-of-mixed-res case) ->
  resample_blocks: an exact nearest-neighbour regrid expressed as a
  grouped Arrow kernel producing a NEW (footprints, blocks) pair on the
  target grid. Laziness note: the reference's VRT defers warping to
  each windowed read; here the resample is a lazy DataFrame the join
  prunes by chunk keys — same effect under Catalyst, though a windowed
  per-tile resample (fused into the stitch) is the planned scale path.

Nearest semantics (center-based, floor):
    src_idx(dst_idx) = floor(((dst_idx + 0.5) * dst_res + dst_origin
                              - src_origin) / src_res)
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .schema import BLOCKS_SCHEMA


class MoaReprojectionError(Exception):
    pass


def reprojection_requested(out_epsg=None, out_wkt=None, out_xres=None, out_yres=None) -> bool:
    """P8 (reference reproj.py:62-69, extended: a bare resolution change
    also routes through the resample path)."""
    return any(v is not None for v in (out_epsg, out_wkt, out_xres, out_yres))


def snap_value(val: float, res: float, ceil: bool) -> float:
    """P9 (reference reproj.py:249-261)."""
    n = val / res
    n = math.ceil(n) if ceil else math.floor(n)
    return res * n


def align_grid(x_min, x_max, y_min, y_max, xres, yres):
    """P9 (reference reproj.py:237-246)."""
    return (
        snap_value(x_min, xres, False),
        snap_value(x_max, xres, True),
        snap_value(y_min, yres, False),
        snap_value(y_max, yres, True),
    )


def reproject_corners(x_min, x_max, y_min, y_max, src_crs: str, dst_crs: str):
    """P10 (reference reproj.py:221-234): transform the 4 corners, take
    the envelope. Requires pyproj (axis order forced x,y — the P11
    axis-swap guard)."""
    try:
        from pyproj import Transformer
    except ImportError as e:
        raise MoaReprojectionError(
            "cross-CRS reprojection requires pyproj, which is not "
            "available in this environment; same-CRS resolution "
            "resampling is supported without it"
        ) from e
    tr = Transformer.from_crs(src_crs, dst_crs, always_xy=True)
    xs, ys = zip(
        tr.transform(x_min, y_max),
        tr.transform(x_max, y_max),
        tr.transform(x_min, y_min),
        tr.transform(x_max, y_min),
    )
    return (min(xs), max(xs), min(ys), max(ys))


def plan_rescaled_footprints(
    footprints: DataFrame, out_xres: float, out_yres: float
) -> DataFrame:
    """Virtual footprints on the target resolution: bounds snapped to
    res multiples (floor mins / ceil maxes, reference reproj.py:205-206),
    sizes re-derived. Source grid kept in s_* columns for the resampler."""
    fx = F.col("x0")
    fy = F.col("y0")
    x_max = fx + F.col("ncols") * F.col("x_res")
    y_min = fy - F.col("nrows") * F.col("y_res")
    nx0 = F.floor(fx / out_xres) * out_xres
    nx1 = F.ceil(x_max / out_xres) * out_xres
    ny1 = F.ceil(fy / out_yres) * out_yres
    ny0 = F.floor(y_min / out_yres) * out_yres
    return footprints.select(
        "media_ref",
        "priority",
        F.col("x0").alias("s_x0"),
        F.col("y0").alias("s_y0"),
        F.col("x_res").alias("s_x_res"),
        F.col("y_res").alias("s_y_res"),
        F.col("ncols").alias("s_ncols"),
        F.col("nrows").alias("s_nrows"),
        nx0.alias("x0"),
        ny1.alias("y0"),
        F.lit(float(out_xres)).alias("x_res"),
        F.lit(float(out_yres)).alias("y_res"),
        F.round((nx1 - nx0) / out_xres).cast("int").alias("ncols"),
        F.round((ny1 - ny0) / out_yres).cast("int").alias("nrows"),
        "n_bands",
        "dtype",
        "nullval",
        "projection",
    )


def resample_blocks(
    footprints: DataFrame,
    blocks: DataFrame,
    out_xres: float,
    out_yres: float,
    src_blocksize: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """Nearest-neighbour regrid of every raster onto the target
    resolution. Returns (new_footprints, new_blocks) matching the
    standard engine schemas — feed straight into do_mosaic.

    Kernel: one Arrow group per (media_ref, band) assembles the source
    raster and gathers with vectorized index maps. Out-of-source target
    pixels (snap margins) are nullval-filled, matching the warp's
    dstNodata fill (reference reproj.py:209-212).
    """
    vfp = plan_rescaled_footprints(footprints, out_xres, out_yres)
    meta = vfp.select(
        "media_ref", "s_x0", "s_y0", "s_x_res", "s_y_res",
        "x0", "y0", "ncols", "nrows", "nullval",
    )
    joined = blocks.join(F.broadcast(meta), on="media_ref")
    sbs = src_blocksize
    ox, oy = float(out_xres), float(out_yres)

    def regrid(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # group rows arrive arbitrarily; accumulate per (ref, band)
        from collections import defaultdict

        groups: dict = defaultdict(list)
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                groups[(r.media_ref, r.band)].append(r)
        out_rows = []
        for (ref, band), rows in groups.items():
            g = rows[0]
            s_nrows = max(int(r.b_top) + int(r.b_ysize) for r in rows)
            s_ncols = max(int(r.b_left) + int(r.b_xsize) for r in rows)
            src = np.full((s_nrows, s_ncols), int(g.nullval), dtype=np.int32)
            for r in rows:
                src[
                    int(r.b_top): int(r.b_top) + int(r.b_ysize),
                    int(r.b_left): int(r.b_left) + int(r.b_xsize),
                ] = np.asarray(r.pixels, dtype=np.int32).reshape(
                    int(r.b_ysize), int(r.b_xsize)
                )
            # center-based nearest index maps, nullval outside source
            vcols = np.arange(int(g.ncols))
            vrows = np.arange(int(g.nrows))
            sx = np.floor(((vcols + 0.5) * ox + (g.x0 - g.s_x0)) / g.s_x_res).astype(int)
            sy = np.floor(((vrows + 0.5) * oy + (g.s_y0 - g.y0)) / g.s_y_res).astype(int)
            valid_x = (sx >= 0) & (sx < s_ncols)
            valid_y = (sy >= 0) & (sy < s_nrows)
            dst = np.full((int(g.nrows), int(g.ncols)), int(g.nullval), dtype=np.int32)
            dst[np.ix_(valid_y, valid_x)] = src[np.ix_(sy[valid_y], sx[valid_x])]
            # re-chunk
            for br in range((int(g.nrows) + sbs - 1) // sbs):
                for bc in range((int(g.ncols) + sbs - 1) // sbs):
                    top, left = br * sbs, bc * sbs
                    chunk = dst[top: top + sbs, left: left + sbs]
                    out_rows.append(
                        {
                            "media_ref": ref,
                            "band": int(band),
                            "b_row": br,
                            "b_col": bc,
                            "b_top": top,
                            "b_left": left,
                            "b_ysize": chunk.shape[0],
                            "b_xsize": chunk.shape[1],
                            "pixels": chunk.ravel(),
                        }
                    )
        cols = [f.name for f in BLOCKS_SCHEMA.fields]
        yield pd.DataFrame(out_rows, columns=cols)

    new_blocks = joined.repartition("media_ref", "band").mapInPandas(
        regrid, BLOCKS_SCHEMA
    )
    new_fp = vfp.drop("s_x0", "s_y0", "s_x_res", "s_y_res", "s_ncols", "s_nrows")
    return new_fp, new_blocks
