"""Independent boundary-ring truth for q_region_outlines.

A deliberately simple Python crack-follower over each region's
membership MASK (the distributed engine works from value comparisons
over tile halos and never sees a whole-region mask): enumerate every
boundary edge as (vertex, direction) with the region on the right of
travel, then walk successors with right-turn preference — the same
4-connectivity convention the engine implements — until every edge is
consumed. Canonicalization matches the engine's contract: collinear
vertices dropped, ring rotated to its lexicographically smallest
vertex, outer-vs-hole by shoelace sign, rings ordered (is_hole,
start_r, start_c).

Writes fixtures/truth/region_outlines.parquet; invoked from
tools/mint_fixtures.py.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# R, D, L, U — right turn is +1 mod 4
DR = [0, 1, 0, -1]
DC = [1, 0, -1, 0]


def region_edges(cells: set, shape) -> set:
    """Every boundary crack of the region as (vertex_r, vertex_c, dir),
    oriented region-on-right."""
    ys, xs = shape
    edges = set()
    for r, c in cells:
        if (r - 1, c) not in cells:
            edges.add((r, c, 0))          # top side, heading R
        if (r, c + 1) not in cells:
            edges.add((r, c + 1, 1))      # right side, heading D
        if (r + 1, c) not in cells:
            edges.add((r + 1, c + 1, 2))  # bottom side, heading L
        if (r, c - 1) not in cells:
            edges.add((r + 1, c, 3))      # left side, heading U
    return edges


def trace_rings(cells: list, shape) -> list[dict]:
    """All rings of one region: walk the crack graph with [right,
    straight, left] successor preference until every edge is used."""
    cellset = set(cells)
    edges = region_edges(cellset, shape)
    remaining = set(edges)
    rings = []
    while remaining:
        start = min(remaining)
        walk = []
        cur = start
        while True:
            walk.append(cur)
            remaining.discard(cur)
            a, b, d = cur
            ea, eb = a + DR[d], b + DC[d]
            for k in (1, 0, 3):
                nd = (d + k) % 4
                if (ea, eb, nd) in edges:
                    cur = (ea, eb, nd)
                    break
            else:
                raise AssertionError(f"dead end at {cur}")
            if cur == start:
                break
        # vertex list = from-vertices with collinear points dropped
        verts = [(a, b) for a, b, _ in walk]
        n = len(verts)
        keep = []
        for i in range(n):
            p, v, nx = verts[i - 1], verts[i], verts[(i + 1) % n]
            if (v[0] - p[0]) * (nx[1] - v[1]) != (v[1] - p[1]) * (nx[0] - v[0]):
                keep.append(v)
        k = keep.index(min(keep))
        keep = keep[k:] + keep[:k]
        area2 = sum(
            keep[i][1] * keep[(i + 1) % len(keep)][0]
            - keep[(i + 1) % len(keep)][1] * keep[i][0]
            for i in range(len(keep))
        )
        rings.append({
            "start_r": keep[0][0], "start_c": keep[0][1],
            "n_vertices": len(keep),
            "is_hole": int(area2 < 0),
            "perim": len(walk),
            "ring_hash": hashlib.md5(
                ";".join(f"{r},{c}" for r, c in keep).encode()
            ).hexdigest()[:16],
        })
    rings.sort(key=lambda g: (g["is_hole"], g["start_r"], g["start_c"]))
    for i, g in enumerate(rings):
        g["ring_idx"] = i
    return rings


def outline_truth_rows() -> list[dict]:
    from moamosaic_spark import driver_contract as DC

    full, regions = DC._region_truth_grid()
    rows = []
    for rid, _v, cells in regions:
        for g in trace_rings(cells, full.shape):
            rows.append({"region_id": rid, **g})
    rows.sort(key=lambda r: (r["region_id"], r["ring_idx"]))
    return rows


def mint_region_outlines() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moamosaic_spark import fixtures as FX

    rows = outline_truth_rows()
    schema = pa.schema([
        ("region_id", pa.int64()), ("ring_idx", pa.int32()),
        ("is_hole", pa.int32()), ("n_vertices", pa.int32()),
        ("perim", pa.int64()), ("start_r", pa.int64()),
        ("start_c", pa.int64()), ("ring_hash", pa.string()),
    ])
    path = FX.truth_path("region_outlines")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, path)
    print(f"  wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    mint_region_outlines()


def iso_truth_rows() -> list[dict]:
    """Iso-contour truth (q_iso_contours): threshold the numpy merged
    replica at DC.ISO_T, BFS the 4-connected mask regions, trace each
    region's rings with the same crack-follower. region_id = min
    global pixel index, matching the engine's convention."""
    from collections import deque

    from moamosaic_spark import driver_contract as DC

    full = DC._merged_truth_grid()
    mask = full >= DC.ISO_T
    sz = full.shape[0]
    vis = mask.copy()
    rows = []
    regions = []
    for r0 in range(sz):
        for c0 in range(sz):
            if not vis[r0, c0]:
                continue
            q = deque([(r0, c0)])
            vis[r0, c0] = False
            cells = []
            while q:
                rr, cc = q.popleft()
                cells.append((rr, cc))
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nr, nc = rr + dr, cc + dc
                    if 0 <= nr < sz and 0 <= nc < sz and vis[nr, nc]:
                        vis[nr, nc] = False
                        q.append((nr, nc))
            regions.append((min(r * sz + c for r, c in cells), cells))
    for rid, cells in regions:
        for g in trace_rings(cells, full.shape):
            rows.append({"region_id": rid, **g})
    rows.sort(key=lambda r: (r["region_id"], r["ring_idx"]))
    return rows


def mint_iso_contours() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moamosaic_spark import fixtures as FX

    rows = iso_truth_rows()
    schema = pa.schema([
        ("region_id", pa.int64()), ("ring_idx", pa.int32()),
        ("is_hole", pa.int32()), ("n_vertices", pa.int32()),
        ("perim", pa.int64()), ("start_r", pa.int64()),
        ("start_c", pa.int64()), ("ring_hash", pa.string()),
    ])
    path = FX.truth_path("iso_contours")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, path)
    print(f"  wrote {path} ({len(rows)} rows)")
