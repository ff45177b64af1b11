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
import pyarrow as pa

from ..plans.grid import OutputGrid, overview_shape

ARROW_STITCH_SCHEMA = pa.schema(
    [
        ("level", pa.int32()),
        ("band", pa.int32()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("y_off", pa.int32()),
        ("x_off", pa.int32()),
        ("ysize", pa.int32()),
        ("xsize", pa.int32()),
        ("pixels", pa.list_(pa.int32())),
        ("px_count", pa.int64()),
        ("px_sum", pa.float64()),
        ("px_ssq", pa.float64()),
        ("px_min", pa.float64()),
        ("px_max", pa.float64()),
    ]
)


def _nearest_state(ysize: int, xsize: int):
    return np.full((ysize, xsize), np.inf)


def _apply_window(canvas, win, nullval, policy, best, in_top, in_left,
                  src_nrows, src_ncols):
    """Fold one contributor window into the canvas.

    policy='last': last non-null wins (reference mosaic.py:683-689).
    policy='nearest': kNN nearest-source tie-breaking (north-star
    extension, NOT in the reference): a non-null pixel wins if its
    source raster's center is nearer (in output pixels) than the
    current holder's; equal distance falls back to last-wins. ``best``
    carries the per-pixel best distance-squared state.
    """
    non_null = win != nullval
    if policy == "last":
        canvas[non_null] = win[non_null]
        return
    # source center in tile-local pixel coords: source col 0 sits at
    # tile-local col -in_left (in_left is the tile's left in src coords)
    cy = -in_top + (src_nrows - 1) / 2.0
    cx = -in_left + (src_ncols - 1) / 2.0
    rr = np.arange(win.shape[0])[:, None] - cy
    cc = np.arange(win.shape[1])[None, :] - cx
    dist = rr * rr + cc * cc
    mask = non_null & (dist <= best)
    canvas[mask] = win[mask]
    best[mask] = dist[mask]


def make_stitch_fn(grid: OutputGrid, levels: list[int], policy: str = "last"):
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
        best = _nearest_state(ysize, xsize) if policy == "nearest" else None

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
            # ordered merge (mosaic.py:683-689) / nearest-source policy
            _apply_window(canvas, win, nullval, policy, best,
                          in_top, in_left, src_nrows, src_ncols)

        rows = [_base_row(band, tile_row, tile_col, top, left, canvas, nullval)]
        rows.extend(
            _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes)
        )
        return pd.DataFrame(rows)

    return stitch


def make_stitch_fn_arrow(grid: OutputGrid, levels: list[int], policy: str = "last"):
    """Arrow-native variant for ``applyInArrow``: identical semantics to
    :func:`make_stitch_fn`, but reads pixel payloads zero-copy from the
    Arrow list buffers and emits one batched ListArray — no pandas
    object-column churn on either side of the kernel. ~2x less Python
    overhead per group at bench scale."""
    nullval = int(grid.nullval)
    ov_shapes = {lvl: overview_shape(grid.nrows, grid.ncols, lvl) for lvl in levels}

    def stitch(key: tuple, tbl: pa.Table) -> pa.Table:
        band, tile_row, tile_col = (int(k.as_py() if hasattr(k, "as_py") else k) for k in key)
        cols = {
            name: tbl.column(name).to_numpy(zero_copy_only=False)
            for name in (
                "top", "left", "ysize", "xsize", "priority",
                "in_top", "in_left", "in_ysize", "in_xsize",
                "src_ncols", "src_nrows", "b_top", "b_left", "b_ysize", "b_xsize",
            )
        }
        px = tbl.column("pixels").combine_chunks()
        offsets = px.offsets.to_numpy()
        values = px.values.to_numpy(zero_copy_only=False)

        top, left = int(cols["top"][0]), int(cols["left"][0])
        ysize, xsize = int(cols["ysize"][0]), int(cols["xsize"][0])
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)
        best = _nearest_state(ysize, xsize) if policy == "nearest" else None

        order = np.argsort(cols["priority"], kind="stable")
        n = len(order)
        i = 0
        while i < n:
            j = i
            prio = cols["priority"][order[i]]
            # contributor = run of rows with equal priority
            idxs = []
            while j < n and cols["priority"][order[j]] == prio:
                idxs.append(order[j])
                j += 1
            r0 = idxs[0]
            in_top, in_left = int(cols["in_top"][r0]), int(cols["in_left"][r0])
            in_ys, in_xs = int(cols["in_ysize"][r0]), int(cols["in_xsize"][r0])
            src_nrows, src_ncols = int(cols["src_nrows"][r0]), int(cols["src_ncols"][r0])
            top1, left1 = max(in_top, 0), max(in_left, 0)
            bottom1 = min(in_top + in_ys, src_nrows)
            right1 = min(in_left + in_xs, src_ncols)
            i = j
            if bottom1 <= top1 or right1 <= left1:
                continue
            win = np.full((in_ys, in_xs), nullval, dtype=np.int32)
            row_off, col_off = max(0, -in_top), max(0, -in_left)
            for ri in idxs:
                b_top, b_left = int(cols["b_top"][ri]), int(cols["b_left"][ri])
                b_ys, b_xs = int(cols["b_ysize"][ri]), int(cols["b_xsize"][ri])
                rt, rb = max(b_top, top1), min(b_top + b_ys, bottom1)
                cl, cr = max(b_left, left1), min(b_left + b_xs, right1)
                if rb <= rt or cr <= cl:
                    continue
                arr = values[offsets[ri]: offsets[ri + 1]].reshape(b_ys, b_xs)
                win[
                    row_off + (rt - top1): row_off + (rb - top1),
                    col_off + (cl - left1): col_off + (cr - left1),
                ] = arr[rt - b_top: rb - b_top, cl - b_left: cl - b_left + (cr - cl)]
            _apply_window(canvas, win, nullval, policy, best,
                          in_top, in_left, src_nrows, src_ncols)

        rows = [_base_row(band, tile_row, tile_col, top, left, canvas, nullval)]
        rows.extend(
            _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes)
        )
        return _rows_to_arrow(rows)

    return stitch


def _rows_to_arrow(rows: list[dict]) -> pa.Table:
    pix = [r["pixels"] for r in rows]
    lengths = np.fromiter((len(p) for p in pix), dtype=np.int64, count=len(pix))
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    values = np.concatenate(pix) if pix else np.array([], dtype=np.int32)
    pixels = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )
    arrs = []
    for field in ARROW_STITCH_SCHEMA:
        if field.name == "pixels":
            arrs.append(pixels)
        else:
            arrs.append(pa.array([r[field.name] for r in rows], type=field.type))
    return pa.Table.from_arrays(arrs, schema=ARROW_STITCH_SCHEMA)


PARTIAL_SCHEMA = pa.schema(
    [
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("top", pa.int32()),
        ("left", pa.int32()),
        ("ysize", pa.int32()),
        ("xsize", pa.int32()),
        ("priority", pa.int32()),   # = salt bucket id (order-preserving)
        ("in_top", pa.int32()),
        ("in_left", pa.int32()),
        ("in_ysize", pa.int32()),
        ("in_xsize", pa.int32()),
        ("src_ncols", pa.int32()),
        ("src_nrows", pa.int32()),
        ("b_top", pa.int32()),
        ("b_left", pa.int32()),
        ("b_ysize", pa.int32()),
        ("b_xsize", pa.int32()),
        ("pixels", pa.list_(pa.int32())),
    ]
)


def make_partial_merge_fn_arrow(grid: OutputGrid):
    """Stage-1 kernel of the SALTED stitch: merge a contiguous-priority
    bucket of contributors into one tile-sized partial canvas.

    Correctness (SURVEY.md §7.5 "ordered merge under salting"): the
    per-pixel fold op(a,b) = (b if b != nullval else a) is associative,
    so partial canvases built over contiguous priority ranges and
    composed in bucket order equal the unsalted fold exactly. The
    partial rows re-enter the NORMAL stitch kernel as synthetic
    contributors (priority = bucket id, window = whole tile), so stage 2
    needs no special casing. Property-tested in tests/test_properties.py
    and end-to-end in tests/test_salted_stitch.py.

    Only valid for merge_policy='last' — the 'nearest' policy carries
    per-pixel best-distance state that a value-only partial cannot.
    """
    nullval = int(grid.nullval)

    def partial(key: tuple, tbl: pa.Table) -> pa.Table:
        band, tile_row, tile_col, salt = (
            int(k.as_py() if hasattr(k, "as_py") else k) for k in key
        )
        cols = {
            name: tbl.column(name).to_numpy(zero_copy_only=False)
            for name in (
                "top", "left", "ysize", "xsize", "priority",
                "in_top", "in_left", "in_ysize", "in_xsize",
                "src_ncols", "src_nrows", "b_top", "b_left", "b_ysize", "b_xsize",
            )
        }
        px = tbl.column("pixels").combine_chunks()
        offsets = px.offsets.to_numpy()
        values = px.values.to_numpy(zero_copy_only=False)
        top, left = int(cols["top"][0]), int(cols["left"][0])
        ysize, xsize = int(cols["ysize"][0]), int(cols["xsize"][0])
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)
        order = np.argsort(cols["priority"], kind="stable")
        n = len(order)
        i = 0
        while i < n:
            j = i
            prio = cols["priority"][order[i]]
            idxs = []
            while j < n and cols["priority"][order[j]] == prio:
                idxs.append(order[j])
                j += 1
            r0 = idxs[0]
            in_top, in_left = int(cols["in_top"][r0]), int(cols["in_left"][r0])
            in_ys, in_xs = int(cols["in_ysize"][r0]), int(cols["in_xsize"][r0])
            src_nrows, src_ncols = int(cols["src_nrows"][r0]), int(cols["src_ncols"][r0])
            top1, left1 = max(in_top, 0), max(in_left, 0)
            bottom1 = min(in_top + in_ys, src_nrows)
            right1 = min(in_left + in_xs, src_ncols)
            i = j
            if bottom1 <= top1 or right1 <= left1:
                continue
            win = np.full((in_ys, in_xs), nullval, dtype=np.int32)
            row_off, col_off = max(0, -in_top), max(0, -in_left)
            for ri in idxs:
                b_top, b_left = int(cols["b_top"][ri]), int(cols["b_left"][ri])
                b_ys, b_xs = int(cols["b_ysize"][ri]), int(cols["b_xsize"][ri])
                rt, rb = max(b_top, top1), min(b_top + b_ys, bottom1)
                cl, cr = max(b_left, left1), min(b_left + b_xs, right1)
                if rb <= rt or cr <= cl:
                    continue
                arr = values[offsets[ri]: offsets[ri + 1]].reshape(b_ys, b_xs)
                win[
                    row_off + (rt - top1): row_off + (rb - top1),
                    col_off + (cl - left1): col_off + (cr - left1),
                ] = arr[rt - b_top: rb - b_top, cl - b_left: cl - b_left + (cr - cl)]
            non_null = win != nullval
            canvas[non_null] = win[non_null]

        row = {
            "tile_row": tile_row, "tile_col": tile_col, "band": band,
            "top": top, "left": left, "ysize": ysize, "xsize": xsize,
            "priority": salt,
            "in_top": 0, "in_left": 0, "in_ysize": ysize, "in_xsize": xsize,
            "src_ncols": xsize, "src_nrows": ysize,
            "b_top": 0, "b_left": 0, "b_ysize": ysize, "b_xsize": xsize,
            "pixels": canvas.ravel(),
        }
        arrs = []
        for field in PARTIAL_SCHEMA:
            if field.name == "pixels":
                arrs.append(
                    pa.ListArray.from_arrays(
                        pa.array([0, canvas.size], type=pa.int32()),
                        pa.array(row["pixels"], type=pa.int32()),
                    )
                )
            else:
                arrs.append(pa.array([row[field.name]], type=field.type))
        return pa.Table.from_arrays(arrs, schema=PARTIAL_SCHEMA)

    return partial


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
