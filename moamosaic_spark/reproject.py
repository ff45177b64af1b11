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
  resample_blocks: a WINDOWED regrid — the unit of work is one target
  chunk, whose needed source window is derived in closed-form column
  math, exploded to source chunk keys, equi-joined, and resampled by a
  grouped pandas kernel over a bounded window (the reference's
  warp-at-windowed-read, reproj.py:209-213, as a relation). Produces a
  NEW lazy (footprints, blocks) pair on the target grid that feeds
  straight into do_mosaic; the mosaic join prunes it by chunk keys.
  Methods: near (exact reference rule), bilinear, average.

Nearest semantics (center-based, floor):
    src_idx(dst_idx) = floor(((dst_idx + 0.5) * dst_res + dst_origin
                              - src_origin) / src_res)
"""

from __future__ import annotations

import math

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


RESAMPLE_METHODS = ("near", "bilinear", "average")


def _resample_window(g, rows, method: str, ox: float, oy: float) -> np.ndarray:
    """Resample ONE target chunk from its covering source chunks.

    ``g`` carries the chunk/grid metadata; ``rows`` the source chunk
    records. Assembles only the needed source WINDOW (size ~ chunk size
    x resolution ratio — bounded, never the whole raster) and applies
    the method. Returns the (tb_ysize, tb_xsize) int32 pixel array.

    Method semantics (deterministic analogs of the reference's GDAL
    ``resamplemethod``, reproj.py:209-213 — GDAL itself is not in this
    container):
      near     — center-based floor gather (exact reference rule).
      bilinear — 4-neighbor interpolation at the center-aligned
                 fractional source coordinate, edge-replicated; if any
                 contributing neighbor is nullval the output is nullval
                 (conservative nodata); banker's rounding to int.
      average  — mean of source pixels whose centers fall inside the
                 target cell, ignoring nullval; cells containing no
                 source center (e.g. upsampling) are nullval.
    """
    nullval = int(g.nullval)
    tb_top, tb_left = int(g.tb_top), int(g.tb_left)
    tb_ys, tb_xs = int(g.tb_ysize), int(g.tb_xsize)
    s_nrows, s_ncols = int(g.s_nrows), int(g.s_ncols)
    # source window actually needed (superset across methods), clamped
    def win_bounds(t0, tsz, o_res, s_orig_off, s_res, s_n):
        lo = math.floor((t0 * o_res + s_orig_off) / s_res) - 2
        hi = math.floor(((t0 + tsz) * o_res + s_orig_off) / s_res) + 2
        return max(0, lo), min(s_n - 1, hi)

    sy_lo, sy_hi = win_bounds(tb_top, tb_ys, oy, g.s_y0 - g.y0, g.s_y_res, s_nrows)
    sx_lo, sx_hi = win_bounds(tb_left, tb_xs, ox, g.x0 - g.s_x0, g.s_x_res, s_ncols)
    win = np.full((sy_hi - sy_lo + 1, sx_hi - sx_lo + 1), nullval, dtype=np.int32)
    for r in rows:
        bt, bl = int(r.b_top), int(r.b_left)
        bys, bxs = int(r.b_ysize), int(r.b_xsize)
        y0c, y1c = max(bt, sy_lo), min(bt + bys, sy_hi + 1)
        x0c, x1c = max(bl, sx_lo), min(bl + bxs, sx_hi + 1)
        if y1c <= y0c or x1c <= x0c:
            continue
        chunk = np.asarray(r.pixels, dtype=np.int32).reshape(bys, bxs)
        win[y0c - sy_lo: y1c - sy_lo, x0c - sx_lo: x1c - sx_lo] = chunk[
            y0c - bt: y1c - bt, x0c - bl: x1c - bl
        ]

    vr = np.arange(tb_top, tb_top + tb_ys, dtype=np.float64)
    vc = np.arange(tb_left, tb_left + tb_xs, dtype=np.float64)
    dst = np.full((tb_ys, tb_xs), nullval, dtype=np.int32)

    if method == "near":
        sy = np.floor(((vr + 0.5) * oy + (g.s_y0 - g.y0)) / g.s_y_res).astype(np.int64)
        sx = np.floor(((vc + 0.5) * ox + (g.x0 - g.s_x0)) / g.s_x_res).astype(np.int64)
        vy = (sy >= 0) & (sy < s_nrows)
        vx = (sx >= 0) & (sx < s_ncols)
        dst[np.ix_(vy, vx)] = win[np.ix_(sy[vy] - sy_lo, sx[vx] - sx_lo)]
        return dst

    if method == "bilinear":
        fy = ((vr + 0.5) * oy + (g.s_y0 - g.y0)) / g.s_y_res - 0.5
        fx = ((vc + 0.5) * ox + (g.x0 - g.s_x0)) / g.s_x_res - 0.5
        # validity matches 'near': the center-nearest pixel must exist
        vy = (np.floor(fy + 0.5) >= 0) & (np.floor(fy + 0.5) < s_nrows)
        vx = (np.floor(fx + 0.5) >= 0) & (np.floor(fx + 0.5) < s_ncols)
        fyv, fxv = fy[vy], fx[vx]
        y0i = np.floor(fyv).astype(np.int64)
        x0i = np.floor(fxv).astype(np.int64)
        wy = (fyv - y0i)[:, None]
        wx = (fxv - x0i)[None, :]
        y0c = np.clip(y0i, 0, s_nrows - 1) - sy_lo
        y1c = np.clip(y0i + 1, 0, s_nrows - 1) - sy_lo
        x0c = np.clip(x0i, 0, s_ncols - 1) - sx_lo
        x1c = np.clip(x0i + 1, 0, s_ncols - 1) - sx_lo
        p00 = win[np.ix_(y0c, x0c)].astype(np.float64)
        p01 = win[np.ix_(y0c, x1c)].astype(np.float64)
        p10 = win[np.ix_(y1c, x0c)].astype(np.float64)
        p11 = win[np.ix_(y1c, x1c)].astype(np.float64)
        val = (
            p00 * (1 - wy) * (1 - wx)
            + p01 * (1 - wy) * wx
            + p10 * wy * (1 - wx)
            + p11 * wy * wx
        )
        any_null = (
            (p00 == nullval) | (p01 == nullval) | (p10 == nullval) | (p11 == nullval)
        )
        out = np.rint(val).astype(np.int32)
        out[any_null] = nullval
        sub = np.full((tb_ys, tb_xs), nullval, dtype=np.int32)
        sub[np.ix_(vy, vx)] = out
        return sub

    if method == "average":
        # inclusive source-index box per target cell: centers inside it
        def box(t, o_res, s_orig_off, s_res, s_n):
            d_lo = (t * o_res + s_orig_off) / s_res
            d_hi = ((t + 1) * o_res + s_orig_off) / s_res
            a = np.ceil(d_lo - 0.5).astype(np.int64)
            b = (np.ceil(d_hi - 0.5) - 1).astype(np.int64)
            return np.clip(a, 0, s_n - 1), np.clip(b, a, s_n), b >= a, a <= s_n - 1, b >= 0

        ya, yb, ynz, ylo_ok, yhi_ok = box(vr, oy, g.s_y0 - g.y0, g.s_y_res, s_nrows)
        xa, xb, xnz, xlo_ok, xhi_ok = box(vc, ox, g.x0 - g.s_x0, g.s_x_res, s_ncols)
        yb = np.minimum(yb, s_nrows - 1)
        xb = np.minimum(xb, s_ncols - 1)
        vy = ynz & ylo_ok & yhi_ok
        vx = xnz & xlo_ok & xhi_ok
        valid = win != nullval
        data = np.where(valid, win, 0).astype(np.float64)
        # 2D prefix sums with a zero border for O(1) box queries
        ps = np.zeros((win.shape[0] + 1, win.shape[1] + 1))
        pc = np.zeros_like(ps)
        ps[1:, 1:] = data.cumsum(0).cumsum(1)
        pc[1:, 1:] = valid.astype(np.float64).cumsum(0).cumsum(1)
        ya_, yb_ = ya[vy] - sy_lo, yb[vy] - sy_lo + 1
        xa_, xb_ = xa[vx] - sx_lo, xb[vx] - sx_lo + 1

        def boxsum(p):
            return (
                p[np.ix_(yb_, xb_)]
                - p[np.ix_(ya_, xb_)]
                - p[np.ix_(yb_, xa_)]
                + p[np.ix_(ya_, xa_)]
            )

        s = boxsum(ps)
        n = boxsum(pc)
        out = np.full(s.shape, nullval, dtype=np.int32)
        nz = n > 0
        out[nz] = np.rint(s[nz] / n[nz]).astype(np.int32)
        sub = np.full((tb_ys, tb_xs), nullval, dtype=np.int32)
        sub[np.ix_(vy, vx)] = out
        return sub

    raise ValueError(f"unknown resample method: {method}")


def resample_blocks(
    footprints: DataFrame,
    blocks: DataFrame,
    out_xres: float,
    out_yres: float,
    src_blocksize: int = 256,
    method: str = "near",
) -> tuple[DataFrame, DataFrame]:
    """Windowed regrid of every raster onto the target resolution.
    Returns (new_footprints, new_blocks) matching the standard engine
    schemas — feed straight into do_mosaic.

    Scale shape (replaces round-1's whole-raster-per-task kernel, which
    assembled the ENTIRE source in one Python group — 40 GB for a
    100k^2 source): the unit of work is one TARGET chunk. The target
    chunk relation is generated JVM-side; each chunk's needed source
    window is derived in closed-form column math and exploded to source
    chunk keys (the reference's windowed warp-at-read, reproj.py:209-213,
    as a relation); the equi-join pulls exactly those chunks; a grouped
    pandas kernel assembles the bounded window (chunk size x resolution
    ratio) and resamples. Pure-margin chunks (outside the source after
    grid snap) never reach Python — synthesized as nullval arrays
    JVM-side, matching the warp's dstNodata fill.

    Assumes the blocks table is keyed b_row = b_top // src_blocksize
    (the same contract _contributor_chunks uses for the mosaic join).
    """
    if method not in RESAMPLE_METHODS:
        raise ValueError(
            f"unknown resample method {method!r}; supported: {RESAMPLE_METHODS}"
        )
    from .session import ensure_workers_can_import

    ensure_workers_can_import(footprints.sparkSession)
    vfp = plan_rescaled_footprints(footprints, out_xres, out_yres)
    meta = vfp.select(
        "media_ref", "n_bands", "s_x0", "s_y0", "s_x_res", "s_y_res",
        "s_ncols", "s_nrows", "x0", "y0", "ncols", "nrows", "nullval",
    )
    sbs = int(src_blocksize)
    ox, oy = float(out_xres), float(out_yres)

    # target chunk relation (JVM-generated, like the blocks fact table)
    t = meta.select(
        "*", F.explode(F.sequence(F.lit(1), F.col("n_bands"))).alias("band")
    ).select(
        "*",
        F.explode(
            F.sequence(F.lit(0), ((F.col("nrows") - 1) / sbs).cast("int"))
        ).alias("tb_row"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.lit(0), ((F.col("ncols") - 1) / sbs).cast("int"))
        ).alias("tb_col"),
    )
    t = (
        t.withColumn("tb_top", F.col("tb_row") * sbs)
        .withColumn("tb_left", F.col("tb_col") * sbs)
        .withColumn("tb_ysize", F.least(F.lit(sbs), F.col("nrows") - F.col("tb_top")))
        .withColumn("tb_xsize", F.least(F.lit(sbs), F.col("ncols") - F.col("tb_left")))
        .where((F.col("tb_ysize") > 0) & (F.col("tb_xsize") > 0))
    )
    # needed source-index window per chunk (superset across methods)
    sy_lo = F.floor((F.col("tb_top") * oy + (F.col("s_y0") - F.col("y0"))) / F.col("s_y_res")) - 2
    sy_hi = F.floor(((F.col("tb_top") + F.col("tb_ysize")) * oy + (F.col("s_y0") - F.col("y0"))) / F.col("s_y_res")) + 2
    sx_lo = F.floor((F.col("tb_left") * ox + (F.col("x0") - F.col("s_x0"))) / F.col("s_x_res")) - 2
    sx_hi = F.floor(((F.col("tb_left") + F.col("tb_xsize")) * ox + (F.col("x0") - F.col("s_x0"))) / F.col("s_x_res")) + 2
    t = (
        t.withColumn("_sy_lo", sy_lo).withColumn("_sy_hi", sy_hi)
        .withColumn("_sx_lo", sx_lo).withColumn("_sx_hi", sx_hi)
    )
    covered_pred = (
        (F.col("_sy_hi") >= 0) & (F.col("_sy_lo") <= F.col("s_nrows") - 1)
        & (F.col("_sx_hi") >= 0) & (F.col("_sx_lo") <= F.col("s_ncols") - 1)
    )
    covered = t.where(covered_pred)
    margin = t.where(~covered_pred)

    # explode covered chunks to covering SOURCE chunk keys and join
    work = covered.select(
        "*",
        F.explode(
            F.sequence(
                (F.greatest(F.col("_sy_lo"), F.lit(0)) / sbs).cast("int"),
                (F.least(F.col("_sy_hi"), F.col("s_nrows") - 1) / sbs).cast("int"),
            )
        ).alias("b_row"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                (F.greatest(F.col("_sx_lo"), F.lit(0)) / sbs).cast("int"),
                (F.least(F.col("_sx_hi"), F.col("s_ncols") - 1) / sbs).cast("int"),
            )
        ).alias("b_col"),
    )
    joined = work.join(blocks, on=["media_ref", "band", "b_row", "b_col"], how="inner")

    def resample_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.iloc[0]
        dst = _resample_window(g, list(pdf.itertuples(index=False)), method, ox, oy)
        return pd.DataFrame(
            [
                {
                    "media_ref": g.media_ref,
                    "band": int(g.band),
                    "b_row": int(g.tb_row),
                    "b_col": int(g.tb_col),
                    "b_top": int(g.tb_top),
                    "b_left": int(g.tb_left),
                    "b_ysize": int(g.tb_ysize),
                    "b_xsize": int(g.tb_xsize),
                    "pixels": dst.ravel(),
                }
            ],
            columns=[f.name for f in BLOCKS_SCHEMA.fields],
        )

    resampled = joined.groupBy("media_ref", "band", "tb_row", "tb_col").applyInPandas(
        resample_group, BLOCKS_SCHEMA
    )
    null_chunks = margin.select(
        "media_ref",
        F.col("band").cast("int").alias("band"),
        F.col("tb_row").cast("int").alias("b_row"),
        F.col("tb_col").cast("int").alias("b_col"),
        F.col("tb_top").cast("int").alias("b_top"),
        F.col("tb_left").cast("int").alias("b_left"),
        F.col("tb_ysize").cast("int").alias("b_ysize"),
        F.col("tb_xsize").cast("int").alias("b_xsize"),
        F.array_repeat(
            F.col("nullval").cast("int"), (F.col("tb_ysize") * F.col("tb_xsize")).cast("int")
        ).alias("pixels"),
    )
    new_blocks = resampled.unionByName(null_chunks)
    new_fp = vfp.drop("s_x0", "s_y0", "s_x_res", "s_y_res", "s_ncols", "s_nrows")
    return new_fp, new_blocks
