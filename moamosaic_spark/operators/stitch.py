"""The stitch kernel: per-(band, tile) grouped Arrow UDF that replays the
reference's read-side padding, ordered overlap-resolution merge,
single-pass statistics partials, and pyramid subsampling in ONE pass.

Reference semantics replicated exactly:

* read-window clamp + null padding — mosaic.py:258-273
* "last non-null wins" ordered merge — mosaic.py:663-689. The fold is
  re-based on a null canvas: starting from ``np.full(nullval)`` and
  overwriting non-null pixels of inputs[0], inputs[1], ... in priority
  order is pixel-identical to the reference's "start from inputs[0] then
  overwrite" (inputs[0]'s null pixels stay null either way). This
  re-basing is what lets contributors with fully-degenerate windows be
  dropped before the shuffle.
* stats partials (count/sum/ssq/min/max over non-null, float64 algebra)
  — mosaic.py:758-777
* pyramid fragments ``arr[lvl//2::lvl, lvl//2::lvl]`` written at
  ``(top//lvl, left//lvl)``, clipped to the overview raster shape
  — mosaic.py:720-743

All pixel math is numpy over Arrow-delivered batches; the only Python
loop is per source *chunk* (a ~64K-pixel array), never per pixel/row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..plans.grid import OutputGrid, overview_shape


def make_stitch_fn(grid: OutputGrid, levels: list[int]):
    """Build the applyInPandas kernel for groupBy(band, tile_row, tile_col).

    Expected input columns (one row per contributor x source-chunk):
        top, left, ysize, xsize                  — tile geometry
        priority, in_top, in_left, in_ysize, in_xsize,
        src_ncols, src_nrows                     — contributor window
        b_top, b_left, b_ysize, b_xsize, pixels  — source chunk
    """
    nullval = int(grid.nullval)
    ov_shapes = {lvl: overview_shape(grid.nrows, grid.ncols, lvl) for lvl in levels}

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, tile_row, tile_col = (int(k) for k in key)
        first = pdf.iloc[0]
        top, left = int(first["top"]), int(first["left"])
        ysize, xsize = int(first["ysize"]), int(first["xsize"])

        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)

        for _prio, grp in pdf.sort_values("priority").groupby("priority", sort=True):
            g0 = grp.iloc[0]
            in_top, in_left = int(g0["in_top"]), int(g0["in_left"])
            in_ys, in_xs = int(g0["in_ysize"]), int(g0["in_xsize"])
            src_nrows, src_ncols = int(g0["src_nrows"]), int(g0["src_ncols"])
            # clamp (mosaic.py:258-263)
            top1, left1 = max(in_top, 0), max(in_left, 0)
            bottom1 = min(in_top + in_ys, src_nrows)
            right1 = min(in_left + in_xs, src_ncols)
            if bottom1 <= top1 or right1 <= left1:
                continue
            # padded window (mosaic.py:268-273)
            win = np.full((in_ys, in_xs), nullval, dtype=np.int32)
            row_off, col_off = max(0, -in_top), max(0, -in_left)
            for chunk in grp.itertuples(index=False):
                b_top, b_left = int(chunk.b_top), int(chunk.b_left)
                b_ys, b_xs = int(chunk.b_ysize), int(chunk.b_xsize)
                rt, rb = max(b_top, top1), min(b_top + b_ys, bottom1)
                cl, cr = max(b_left, left1), min(b_left + b_xs, right1)
                if rb <= rt or cr <= cl:
                    continue
                arr = np.asarray(chunk.pixels, dtype=np.int32).reshape(b_ys, b_xs)
                win[
                    row_off + (rt - top1): row_off + (rb - top1),
                    col_off + (cl - left1): col_off + (cr - left1),
                ] = arr[rt - b_top: rb - b_top, cl - b_left: cr - b_left]
            # ordered merge (mosaic.py:683-689)
            non_null = win != nullval
            canvas[non_null] = win[non_null]

        rows = [_base_row(band, tile_row, tile_col, top, left, canvas, nullval)]
        rows.extend(
            _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes)
        )
        return pd.DataFrame(rows)

    return stitch


def _base_row(band, tile_row, tile_col, top, left, canvas, nullval) -> dict:
    values = canvas[canvas != nullval]
    n = int(values.size)
    v64 = values.astype(np.float64)
    return {
        "level": 0,
        "band": band,
        "tile_row": tile_row,
        "tile_col": tile_col,
        "y_off": top,
        "x_off": left,
        "ysize": canvas.shape[0],
        "xsize": canvas.shape[1],
        "pixels": canvas.ravel(),
        "px_count": n,
        "px_sum": float(v64.sum()) if n else 0.0,
        "px_ssq": float((v64**2).sum()) if n else 0.0,
        "px_min": float(values.min()) if n else None,
        "px_max": float(values.max()) if n else None,
    }


def _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes):
    rows = []
    for lvl in levels:
        o = lvl // 2
        sub = canvas[o::lvl, o::lvl]
        y_off, x_off = top // lvl, left // lvl
        ov_nr, ov_nc = ov_shapes[lvl]
        sub = sub[: max(0, ov_nr - y_off), : max(0, ov_nc - x_off)]
        if sub.size == 0:
            continue
        rows.append(
            {
                "level": lvl,
                "band": band,
                "tile_row": tile_row,
                "tile_col": tile_col,
                "y_off": y_off,
                "x_off": x_off,
                "ysize": sub.shape[0],
                "xsize": sub.shape[1],
                "pixels": sub.ravel(),
                "px_count": 0,
                "px_sum": 0.0,
                "px_ssq": 0.0,
                "px_min": None,
                "px_max": None,
            }
        )
    return rows
