"""Property-based tests (hypothesis) for the pure planning/merge math —
the one-line-trap zones of SURVEY.md §7.5."""

import numpy as np
from hypothesis import given, settings, strategies as st

from moamosaic_spark.operators.stitch import _apply_window, _nearest_state
from moamosaic_spark.plans.grid import block_edges, n_blocks, overview_shape
from moamosaic_spark.sources.synth import _tiling_loop


@given(n=st.integers(1, 200_000), bs=st.sampled_from([16, 64, 100, 256, 333, 1024, 4096]))
@settings(max_examples=300, deadline=None)
def test_tiling_closed_form_equals_loop(n, bs):
    assert block_edges(n, bs) == _tiling_loop(n, bs)
    edges = block_edges(n, bs)
    # tiles cover [0, n) exactly, no overlap, sizes within [1, bs + bs//4)
    assert edges[0][0] == 0
    assert sum(sz for _, sz in edges) == n
    for i in range(1, len(edges)):
        assert edges[i][0] == edges[i - 1][0] + edges[i - 1][1]
    for _, sz in edges[:-1]:
        assert sz == bs
    assert 1 <= edges[-1][1] < bs + max(bs // 4, 1)
    assert len(edges) == n_blocks(n, bs)


@given(nr=st.integers(1, 5000), nc=st.integers(1, 5000), p=st.integers(2, 8))
@settings(max_examples=200, deadline=None)
def test_overview_shape_equals_stride(nr, nc, p):
    lvl = 2**p
    o = lvl // 2
    arr = np.empty((nr, nc), dtype=np.uint8)
    assert overview_shape(nr, nc, lvl) == arr[o::lvl, o::lvl].shape


@given(
    seed=st.integers(0, 2**32 - 1),
    n_contrib=st.integers(1, 6),
    size=st.integers(4, 24),
)
@settings(max_examples=150, deadline=None)
def test_last_policy_fold_equals_sequential_paste(seed, n_contrib, size):
    """The re-based fold (null canvas + overwrite non-null in order)
    equals the reference fold (start from inputs[0], overwrite later
    non-null) — the equivalence the stitch kernel relies on
    (operators/stitch.py docstring)."""
    rng = np.random.default_rng(seed)
    nullval = 0
    wins = [
        rng.integers(0, 4, size=(size, size)).astype(np.int32) * rng.integers(1, 100)
        for _ in range(n_contrib)
    ]
    # engine fold
    canvas = np.full((size, size), nullval, dtype=np.int32)
    for w in wins:
        _apply_window(canvas, w, nullval, "last", None, 0, 0, size, size)
    # reference fold (mosaic.py:683-689 verbatim semantics)
    ref = wins[0].copy()
    for w in wins[1:]:
        nn = w != nullval
        ref[nn] = w[nn]
    np.testing.assert_array_equal(canvas, ref)


@given(seed=st.integers(0, 2**32 - 1), size=st.integers(4, 16))
@settings(max_examples=100, deadline=None)
def test_nearest_policy_is_order_insensitive_without_ties(seed, size):
    """With distinct source-center distances, the nearest fold gives the
    same result in any contributor order — the property that makes the
    policy safe under salted/partial merges."""
    rng = np.random.default_rng(seed)
    nullval = 0
    contribs = []
    for i in range(3):
        win = rng.integers(1, 100, size=(size, size)).astype(np.int32)
        # distinct centers -> distinct distance fields a.s.
        contribs.append((win, -(i * 3 + 1), -(i * 2 + 2)))
    out = []
    for order in ([0, 1, 2], [2, 0, 1], [1, 2, 0]):
        canvas = np.full((size, size), nullval, dtype=np.int32)
        best = _nearest_state(size, size)
        for idx in order:
            win, it, il = contribs[idx]
            _apply_window(canvas, win, nullval, "nearest", best, it, il, size, size)
        out.append(canvas)
    dists = []
    for win, it, il in contribs:
        cy = -it + (size - 1) / 2.0
        cx = -il + (size - 1) / 2.0
        rr = np.arange(size)[:, None] - cy
        cc = np.arange(size)[None, :] - cx
        dists.append(rr * rr + cc * cc)
    stack = np.stack(dists)
    ties = (np.sort(stack, axis=0)[0] == np.sort(stack, axis=0)[1]).any()
    if not ties:
        np.testing.assert_array_equal(out[0], out[1])
        np.testing.assert_array_equal(out[0], out[2])


# ---------------------------------------------------------------------------
# Round-2 math: TM transforms and the shifted-grid candidate guarantee
# ---------------------------------------------------------------------------

@given(
    lon=st.floats(150.05, 155.95),
    lat=st.floats(-75.0, -0.2),
)
@settings(max_examples=300, deadline=None)
def test_tm_roundtrip_property(lon, lat):
    from moamosaic_spark import crs

    x, y = crs.tm_forward(lon, lat, *crs.utm_params(32756))
    lon2, lat2 = crs.tm_inverse(x, y, *crs.utm_params(32756))
    assert abs(float(lon2) - lon) < 1e-7
    assert abs(float(lat2) - lat) < 1e-7


@given(
    data=st.data(),
    j=st.integers(1, 4),
    d_max=st.floats(0.01, 1.5),
)
@settings(max_examples=300, deadline=None)
def test_shifted_grid_guarantee(data, j, d_max):
    """The neardup candidate scheme's core claim: two points whose
    per-dim distance is <= d_max share a full cell tuple in at least
    one of the 2^j shifted grids (cell width 2*d_max, shifts 0/d_max)."""
    import math

    pa = [data.draw(st.floats(-2.0, 2.0)) for _ in range(j)]
    pb = [
        min(2.0, max(-2.0, pa[d] + data.draw(st.floats(-1.0, 1.0)) * d_max))
        for d in range(j)
    ]
    # padded step, exactly as neardup_pairs computes it: a pair at
    # distance exactly d_max landing exactly on a boundary straddles
    # both shifts of an UNpadded grid (hypothesis found it)
    d_pad = d_max * (1.0 + 1e-9)
    cell_w = 2.0 * d_pad

    def cells(p, g):
        return tuple(
            math.floor((p[d] + d_pad * ((g >> d) & 1)) / cell_w) for d in range(j)
        )

    assert any(cells(pa, g) == cells(pb, g) for g in range(2 ** j)), (
        pa, pb, d_max,
    )
