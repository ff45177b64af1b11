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
* contributor window-shape guard — mosaic.py:586-593 (rows sharing a
  priority must agree on their window geometry; mismatch raises instead
  of silently pasting through the wrong window)
* stats partials (count/sum/ssq/min/max over non-null, float64 algebra)
  — mosaic.py:758-777
* pyramid fragments ``arr[lvl//2::lvl, lvl//2::lvl]`` written at
  ``(top//lvl, left//lvl)``, clipped to the overview raster shape
  — mosaic.py:720-743

All pixel math is numpy over Arrow-delivered batches; the only Python
loop is per source *chunk* (a ~64K-pixel array), never per pixel/row.
One fold implementation (`_fold_arrow_group`) serves both the full
stitch and the salted stage-1 partial merge.
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


def _binary_pixel_schema(schema: pa.Schema) -> pa.Schema:
    """The u2 layout twin: pixels as packed uint16-LE bytes (2 B/px)."""
    i = schema.get_field_index("pixels")
    return schema.set(i, pa.field("pixels", pa.binary()))

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

_WINDOW_COLS = (
    "top", "left", "ysize", "xsize", "priority",
    "in_top", "in_left", "in_ysize", "in_xsize",
    "src_ncols", "src_nrows", "b_top", "b_left", "b_ysize", "b_xsize",
)


def _nearest_state(ysize: int, xsize: int):
    return np.full((ysize, xsize), np.inf)


def _blend_state(ysize: int, xsize: int, feather: int):
    """(weight sum, weighted value sum, feather width) accumulators for
    policy='blend'. INTEGER accumulators deliberately: weights and
    pixel values are ints, so the sums are exact and ORDER-FREE —
    float accumulation would differ from a SQL oracle's arbitrary sum
    order in the last ulp and flip rounded values at .5 boundaries."""
    return (
        np.zeros((ysize, xsize), dtype=np.int64),
        np.zeros((ysize, xsize), dtype=np.int64),
        int(feather),
    )


def _policy_state(policy: str, ysize: int, xsize: int, feather: int):
    if policy == "last":
        return None
    if policy == "nearest":
        return _nearest_state(ysize, xsize)
    if policy == "blend":
        return _blend_state(ysize, xsize, feather)
    raise ValueError(
        f"unknown merge_policy {policy!r} (expected 'last', 'nearest' or 'blend')"
    )


def _apply_window(canvas, win, nullval, policy, best, in_top, in_left,
                  src_nrows, src_ncols):
    """Fold one contributor window into the canvas.

    policy='last': last non-null wins (reference mosaic.py:683-689).
    policy='nearest': kNN nearest-source tie-breaking (north-star
    extension, NOT in the reference): a non-null pixel wins if its
    source raster's center is nearer (in output pixels) than the
    current holder's; equal distance falls back to last-wins. ``best``
    carries the per-pixel best distance-squared state.
    policy='blend': nodata-aware EDGE-BLENDING (north-star extension):
    overlapping non-null pixels are feathered — each contributor
    weighs in by its pixel's distance to its own source edge (clamped
    to the feather width), so seams fade instead of stepping; null
    pixels contribute nothing. ``best`` carries (weight-sum,
    weighted-value-sum, feather); the blended canvas is resolved in
    _finalize_policy.
    """
    non_null = win != nullval
    if policy == "last":
        canvas[non_null] = win[non_null]
        return
    if policy == "blend":
        wsum, wvsum, feather = best
        # distance of each window pixel to its SOURCE's nearest edge
        # (source row of window row r is in_top + r); padded
        # out-of-extent pixels are null and masked out anyway
        sr = in_top + np.arange(win.shape[0], dtype=np.int64)
        sc = in_left + np.arange(win.shape[1], dtype=np.int64)
        dr = np.minimum(sr + 1, src_nrows - sr)
        dc = np.minimum(sc + 1, src_ncols - sc)
        w = np.clip(np.minimum(dr[:, None], dc[None, :]), 1, int(feather))
        wsum[non_null] += w[non_null]
        wvsum[non_null] += w[non_null] * win[non_null].astype(np.int64)
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


def _finalize_policy(canvas, policy, best) -> None:
    """Resolve accumulated policy state into the canvas (blend only;
    last/nearest write the canvas directly). Blend rounds HALF-UP via
    exact integer division — (2*wv + w) // (2*w) — so any SQL engine
    reproduces it bit-identically (np.rint's half-to-even and SQL
    round()'s half-away diverge at .5 boundaries)."""
    if policy == "blend":
        wsum, wvsum, _ = best
        valid = wsum > 0
        canvas[valid] = (
            (2 * wvsum[valid] + wsum[valid]) // (2 * wsum[valid])
        ).astype(np.int32)


def _extract_arrow_group(tbl: pa.Table):
    """Column arrays + pixel buffers from one Arrow group, zero-copy
    where the types allow. Handles both pixel layouts: list<int32>
    (values = int32 elements) and binary u2 (values = a '<u2' view of
    the data buffer; byte offsets halved to element offsets)."""
    cols = {
        name: tbl.column(name).to_numpy(zero_copy_only=False)
        for name in _WINDOW_COLS
    }
    px = tbl.column("pixels").combine_chunks()
    if pa.types.is_binary(px.type):
        offsets = np.frombuffer(
            px.buffers()[1], dtype=np.int32, count=len(px) + 1, offset=px.offset * 4
        )
        data = px.buffers()[2]
        values = (
            np.frombuffer(data, dtype="<u2") if data is not None
            else np.array([], dtype="<u2")
        )
        return cols, offsets // 2, values
    return cols, px.offsets.to_numpy(), px.values.to_numpy(zero_copy_only=False)


def _check_run_geometry(cols, idxs, key):
    """Reference shape guard (mosaic.py:586-593): every row of a
    priority run must describe the same contributor window — otherwise
    two sources share a priority and pixels would be pasted through the
    wrong geometry. Raise instead of corrupting."""
    r0 = idxs[0]
    for ri in idxs[1:]:
        for c in ("in_top", "in_left", "in_ysize", "in_xsize", "src_nrows", "src_ncols"):
            if cols[c][ri] != cols[c][r0]:
                raise ValueError(
                    f"window geometry mismatch within priority "
                    f"{int(cols['priority'][r0])} at group {key}: two sources "
                    f"share a priority (priorities must be unique per source)"
                )


def _fold_arrow_group(cols, offsets, values, canvas, nullval, policy, best, key):
    """The ordered merge over one Arrow group: for each contiguous
    priority run (one contributor), clamp + pad + paste its chunks into
    a window, then fold the window into the canvas. Shared by the full
    stitch and the salted stage-1 partial merge."""
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
        i = j
        _check_run_geometry(cols, idxs, key)
        r0 = idxs[0]
        in_top, in_left = int(cols["in_top"][r0]), int(cols["in_left"][r0])
        in_ys, in_xs = int(cols["in_ysize"][r0]), int(cols["in_xsize"][r0])
        src_nrows, src_ncols = int(cols["src_nrows"][r0]), int(cols["src_ncols"][r0])
        # clamp (mosaic.py:258-263)
        top1, left1 = max(in_top, 0), max(in_left, 0)
        bottom1 = min(in_top + in_ys, src_nrows)
        right1 = min(in_left + in_xs, src_ncols)
        if bottom1 <= top1 or right1 <= left1:
            continue
        # padded window (mosaic.py:268-273)
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
            ] = arr[rt - b_top: rb - b_top, cl - b_left: cr - b_left]
        _apply_window(canvas, win, nullval, policy, best,
                      in_top, in_left, src_nrows, src_ncols)


def make_stitch_fn_arrow(
    grid: OutputGrid, levels: list[int], policy: str = "last", binary: bool = False,
    feather: int = 64,
):
    """The applyInArrow kernel for groupBy(band, tile_row, tile_col):
    reads pixel payloads zero-copy from the Arrow list buffers and emits
    one batched ListArray — no pandas object-column churn. ``binary``
    emits the u2 packed layout (input layout is auto-detected)."""
    nullval = int(grid.nullval)
    ov_shapes = {lvl: overview_shape(grid.nrows, grid.ncols, lvl) for lvl in levels}
    out_schema = _binary_pixel_schema(ARROW_STITCH_SCHEMA) if binary else ARROW_STITCH_SCHEMA

    def stitch(key: tuple, tbl: pa.Table) -> pa.Table:
        band, tile_row, tile_col = (int(k.as_py() if hasattr(k, "as_py") else k) for k in key)
        cols, offsets, values = _extract_arrow_group(tbl)
        top, left = int(cols["top"][0]), int(cols["left"][0])
        ysize, xsize = int(cols["ysize"][0]), int(cols["xsize"][0])
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)
        best = _policy_state(policy, ysize, xsize, feather)
        _fold_arrow_group(cols, offsets, values, canvas, nullval, policy, best,
                          (band, tile_row, tile_col))
        _finalize_policy(canvas, policy, best)
        rows = [_base_row(band, tile_row, tile_col, top, left, canvas, nullval)]
        rows.extend(
            _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes)
        )
        return _rows_to_arrow(rows, out_schema)

    return stitch


def make_partial_merge_fn_arrow(grid: OutputGrid, binary: bool = False):
    """Stage-1 kernel of the SALTED stitch: merge a contiguous-priority
    bucket of contributors into one partial canvas, emitted as a
    synthetic contributor row covering the bounding box of its non-null
    pixels (not the whole tile — partially covered tiles would otherwise
    inflate the stage-2 shuffle).

    Correctness (SURVEY.md §7.5 "ordered merge under salting"): the
    per-pixel fold op(a,b) = (b if b != nullval else a) is associative,
    so partial canvases built over contiguous priority ranges and
    composed in bucket order equal the unsalted fold exactly. Partial
    rows re-enter the NORMAL stitch kernel (priority = bucket id), so
    stage 2 shares this module's single fold implementation. Only valid
    for merge_policy='last' — 'nearest' carries per-pixel best-distance
    state a value-only partial cannot.
    """
    nullval = int(grid.nullval)
    out_schema = _binary_pixel_schema(PARTIAL_SCHEMA) if binary else PARTIAL_SCHEMA

    def partial(key: tuple, tbl: pa.Table) -> pa.Table:
        band, tile_row, tile_col, salt = (
            int(k.as_py() if hasattr(k, "as_py") else k) for k in key
        )
        cols, offsets, values = _extract_arrow_group(tbl)
        top, left = int(cols["top"][0]), int(cols["left"][0])
        ysize, xsize = int(cols["ysize"][0]), int(cols["xsize"][0])
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)
        _fold_arrow_group(cols, offsets, values, canvas, nullval, "last", None,
                          (band, tile_row, tile_col, salt))

        # bounding box of written (non-null) pixels. An all-null bucket
        # still emits a 1x1 null box: dropping it entirely could drop the
        # TILE from stage 2 when every bucket is all-null, whereas the
        # unsalted path emits a null tile for assigned-but-all-null input.
        nn_rows = np.flatnonzero((canvas != nullval).any(axis=1))
        nn_cols = np.flatnonzero((canvas != nullval).any(axis=0))
        if nn_rows.size == 0:
            r0, r1, c0, c1 = 0, 1, 0, 1
        else:
            r0, r1 = int(nn_rows[0]), int(nn_rows[-1]) + 1
            c0, c1 = int(nn_cols[0]), int(nn_cols[-1]) + 1
        box = canvas[r0:r1, c0:c1]
        row = {
            "tile_row": tile_row, "tile_col": tile_col, "band": band,
            "top": top, "left": left, "ysize": ysize, "xsize": xsize,
            "priority": salt,
            # window geometry: the bbox as a synthetic source placed so
            # that src px (0,0) lands at tile-local (r0, c0):
            # in_top = -r0 => pad offset row_off = r0; clamp keeps the
            # bbox extent because src dims == bbox dims.
            "in_top": -r0, "in_left": -c0,
            "in_ysize": ysize, "in_xsize": xsize,
            "src_nrows": r1 - r0, "src_ncols": c1 - c0,
            "b_top": 0, "b_left": 0, "b_ysize": r1 - r0, "b_xsize": c1 - c0,
            "pixels": box.ravel(),
        }
        return _rows_to_arrow([row], out_schema)

    return partial


def make_blend_partial_fn_arrow(grid: OutputGrid, feather: int, binary: bool = False):
    """Stage-1 kernel of the SALTED BLEND stitch. Blend is a per-pixel
    SUM of (weight, weight*value) over non-null contributors —
    commutative and associative, unlike 'last' (order-dependent) or
    'nearest' (arg-min state) — so each priority bucket can emit its
    integer (wsum, wvsum) partial canvases and stage 2 just adds them:
    exact under any bucket composition order. Partials ride the
    PARTIAL_MERGE geometry convention (bbox placed via in_top=-r0) with
    two int64 payload columns; ``pixels`` is null on partial rows, which
    is how the stage-2 kernel tells them from raw (cold-tile) rows."""
    nullval = int(grid.nullval)
    base = _binary_pixel_schema(PARTIAL_SCHEMA) if binary else PARTIAL_SCHEMA
    out_schema = pa.schema(
        list(base)
        + [pa.field("wsum", pa.list_(pa.int64())), pa.field("wvsum", pa.list_(pa.int64()))]
    )

    def partial(key: tuple, tbl: pa.Table) -> pa.Table:
        band, tile_row, tile_col, salt = (
            int(k.as_py() if hasattr(k, "as_py") else k) for k in key
        )
        cols, offsets, values = _extract_arrow_group(tbl)
        top, left = int(cols["top"][0]), int(cols["left"][0])
        ysize, xsize = int(cols["ysize"][0]), int(cols["xsize"][0])
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)  # unused sink
        best = _blend_state(ysize, xsize, feather)
        _fold_arrow_group(cols, offsets, values, canvas, nullval, "blend", best,
                          (band, tile_row, tile_col, salt))
        wsum, wvsum, _ = best
        nz_rows = np.flatnonzero((wsum > 0).any(axis=1))
        nz_cols = np.flatnonzero((wsum > 0).any(axis=0))
        if nz_rows.size == 0:
            r0, r1, c0, c1 = 0, 1, 0, 1
        else:
            r0, r1 = int(nz_rows[0]), int(nz_rows[-1]) + 1
            c0, c1 = int(nz_cols[0]), int(nz_cols[-1]) + 1
        row = {
            "tile_row": tile_row, "tile_col": tile_col, "band": band,
            "top": top, "left": left, "ysize": ysize, "xsize": xsize,
            "priority": salt,
            "in_top": -r0, "in_left": -c0,
            "in_ysize": ysize, "in_xsize": xsize,
            "src_nrows": r1 - r0, "src_ncols": c1 - c0,
            "b_top": 0, "b_left": 0, "b_ysize": r1 - r0, "b_xsize": c1 - c0,
        }
        arrs = []
        for field in out_schema:
            if field.name == "pixels":
                arrs.append(pa.nulls(1, field.type))
            elif field.name in ("wsum", "wvsum"):
                payload = (wsum if field.name == "wsum" else wvsum)[r0:r1, c0:c1].ravel()
                arrs.append(pa.ListArray.from_arrays(
                    pa.array([0, payload.size], pa.int32()),
                    pa.array(payload, pa.int64()),
                ))
            else:
                arrs.append(pa.array([row[field.name]], field.type))
        return pa.Table.from_arrays(arrs, schema=out_schema)

    return partial


def make_blend_stitch_fn_arrow(
    grid: OutputGrid, levels: list[int], feather: int, binary: bool = False,
):
    """Stage-2 kernel of the salted blend stitch: raw rows (cold tiles —
    ``pixels`` non-null) fold through the normal blend accumulate;
    partial rows (hot tiles) add their (wsum, wvsum) canvases at their
    bbox offsets. Finalize is the same exact integer half-up division
    as the unsalted path, so salted == unsalted bit-for-bit."""
    import pyarrow.compute as pc

    nullval = int(grid.nullval)
    ov_shapes = {lvl: overview_shape(grid.nrows, grid.ncols, lvl) for lvl in levels}
    out_schema = _binary_pixel_schema(ARROW_STITCH_SCHEMA) if binary else ARROW_STITCH_SCHEMA

    def stitch(key: tuple, tbl: pa.Table) -> pa.Table:
        band, tile_row, tile_col = (
            int(k.as_py() if hasattr(k, "as_py") else k) for k in key
        )
        mask = pc.is_valid(tbl.column("wsum").combine_chunks())
        raw_tbl = tbl.filter(pc.invert(mask))
        part_tbl = tbl.filter(mask)
        top = int(tbl.column("top")[0].as_py())
        left = int(tbl.column("left")[0].as_py())
        ysize = int(tbl.column("ysize")[0].as_py())
        xsize = int(tbl.column("xsize")[0].as_py())
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)
        best = _blend_state(ysize, xsize, feather)
        if raw_tbl.num_rows:
            cols, offsets, values = _extract_arrow_group(raw_tbl)
            _fold_arrow_group(cols, offsets, values, canvas, nullval, "blend", best,
                              (band, tile_row, tile_col))
        if part_tbl.num_rows:
            wsum_t, wvsum_t, _ = best
            geo = {
                c: part_tbl.column(c).to_numpy(zero_copy_only=False)
                for c in ("in_top", "in_left", "src_nrows", "src_ncols")
            }
            ws = part_tbl.column("wsum").combine_chunks()
            wv = part_tbl.column("wvsum").combine_chunks()
            ws_off, ws_val = ws.offsets.to_numpy(), ws.values.to_numpy(zero_copy_only=False)
            wv_off, wv_val = wv.offsets.to_numpy(), wv.values.to_numpy(zero_copy_only=False)
            for i in range(part_tbl.num_rows):
                r0, c0 = -int(geo["in_top"][i]), -int(geo["in_left"][i])
                h, w = int(geo["src_nrows"][i]), int(geo["src_ncols"][i])
                wsum_t[r0: r0 + h, c0: c0 + w] += ws_val[ws_off[i]: ws_off[i + 1]].reshape(h, w)
                wvsum_t[r0: r0 + h, c0: c0 + w] += wv_val[wv_off[i]: wv_off[i + 1]].reshape(h, w)
        _finalize_policy(canvas, "blend", best)
        rows = [_base_row(band, tile_row, tile_col, top, left, canvas, nullval)]
        rows.extend(
            _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes)
        )
        return _rows_to_arrow(rows, out_schema)

    return stitch


def _pandas_pixel_arrays(col) -> list[np.ndarray]:
    """Per-row pixel arrays from a pandas column of either layout
    (int lists/arrays, or u2-packed bytes)."""
    return [
        np.frombuffer(p, dtype="<u2") if isinstance(p, (bytes, bytearray))
        else np.asarray(p, dtype=np.int32)
        for p in col
    ]


def make_stitch_fn(
    grid: OutputGrid, levels: list[int], policy: str = "last", binary: bool = False,
    feather: int = 64,
):
    """pandas (applyInPandas) variant of the stitch kernel — same
    semantics as make_stitch_fn_arrow; kept for environments where the
    Arrow grouped-map API is unavailable."""
    nullval = int(grid.nullval)
    ov_shapes = {lvl: overview_shape(grid.nrows, grid.ncols, lvl) for lvl in levels}

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, tile_row, tile_col = (int(k) for k in key)
        cols = {name: pdf[name].to_numpy() for name in _WINDOW_COLS}
        arrays = _pandas_pixel_arrays(pdf["pixels"])
        lengths = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        values = (
            np.concatenate([a.astype(np.int32, copy=False) for a in arrays])
            if arrays
            else np.array([], dtype=np.int32)
        )
        top, left = int(cols["top"][0]), int(cols["left"][0])
        ysize, xsize = int(cols["ysize"][0]), int(cols["xsize"][0])
        canvas = np.full((ysize, xsize), nullval, dtype=np.int32)
        best = _policy_state(policy, ysize, xsize, feather)
        _fold_arrow_group(cols, offsets, values, canvas, nullval, policy, best,
                          (band, tile_row, tile_col))
        _finalize_policy(canvas, policy, best)
        rows = [_base_row(band, tile_row, tile_col, top, left, canvas, nullval)]
        rows.extend(
            _pyramid_rows(band, tile_row, tile_col, top, left, canvas, levels, ov_shapes)
        )
        if binary:
            for r in rows:
                r["pixels"] = np.ascontiguousarray(r["pixels"].astype("<u2")).tobytes()
        return pd.DataFrame(rows)

    return stitch


def _rows_to_arrow(rows: list[dict], schema: pa.Schema) -> pa.Table:
    pix = [r["pixels"] for r in rows]
    lengths = np.fromiter((len(p) for p in pix), dtype=np.int64, count=len(pix))
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    values = np.concatenate(pix) if pix else np.array([], dtype=np.int32)
    if pa.types.is_binary(schema.field("pixels").type):
        # u2 layout: pack the int canvases to uint16-LE bytes (2 B/px)
        data = np.ascontiguousarray(values.astype("<u2"))
        pixels = pa.Array.from_buffers(
            pa.binary(),
            len(pix),
            [None, pa.py_buffer((offsets * 2).astype(np.int32)), pa.py_buffer(data)],
        )
    else:
        pixels = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
        )
    arrs = []
    for field in schema:
        if field.name == "pixels":
            arrs.append(pixels)
        else:
            arrs.append(pa.array([r[field.name] for r in rows], type=field.type))
    return pa.Table.from_arrays(arrs, schema=schema)


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
