"""Drainage-basin labeling (watershed segmentation) over a D8 flow
raster — the hydrology product downstream of ``functions/focal.terrain``.

Reference-side scope: the reference computes whole-image aggregates
only (mosaic.py:746-794); flow routing is part of the raster-analysis
family this engine adds on top (gdaldem / r.watershed analog).

Every defined cell carries one out-edge (its D8 steepest-descent
neighbor), so the flow graph is a functional forest: pits/flats are
roots, and a cell's BASIN is the root its water reaches. The
distributed algorithm is pointer doubling: state (gid, ptr, dist)
where ptr starts as the immediate downstream cell; each round joins
the state to itself so ptr jumps 2^k hops; sinks are absorbing
self-loops. Rounds = ceil(log2(max path length)) — a 10^5-px river
resolves in 17 shuffle rounds regardless of raster size, the same
O(log)-round shape as the dedup connected-components. One driver job
per round decides convergence.

Semantics at the defined-region boundary: a cell whose downstream
neighbor has no defined D8 value (raster border / null-adjacent)
terminates there — the undefined cell becomes a "virtual outlet" and
labels that basin. This keeps the relation closed without consulting
pixels the terrain operator refused to define.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .focal import D8_DIRS, D8_FLAT  # noqa: F401 (D8_FLAT re-exported for callers)


def d8_edges(terrain_tiles: DataFrame, g_ncols: int, blocksize: int) -> DataFrame:
    """(gid, dst) for every defined cell of a ``terrain()`` result:
    dst = the D8 neighbor's global pixel index, or gid itself for
    pits/flats (D8_FLAT). Pure JVM: posexplode + array-literal offset
    lookup, no Python per pixel. gid comes from the single
    tiling-contract expression (plans/grid.global_pixel_index); a D8
    neighbor is always in-raster (border cells are undefined), so
    dst = gid + the flattened offset."""
    from ..plans.grid import global_pixel_index

    # flattened row-major offset per D8 code; pits/flats offset 0
    off = F.array(*[F.lit(dy * g_ncols + dx) for dy, dx in D8_DIRS], F.lit(0))
    e = terrain_tiles.select(
        "band", "tile_row", "tile_col", "ysize", "xsize",
        F.posexplode("d8").alias("pos", "code"),
    ).where(F.col("code") != -1)
    gid = global_pixel_index(F.col("pos"), blocksize, g_ncols)
    dst = gid + F.element_at(off, F.col("code").cast("int") + 1)
    return e.select("band", gid.alias("gid"), dst.alias("dst"))


def flow_basins(
    edges: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """Resolve every cell to its terminal sink by pointer doubling.

    Input: (band, gid, dst) — one row per defined cell. Output:
    (band, gid, basin, dist, is_cell) where basin is the absorbing
    cell's gid (a pit/flat, or a virtual outlet just outside the
    defined region) and dist the hop count to it; is_cell = False on
    the synthetic absorbing rows (virtual outlets are not raster
    cells and are excluded from rollups).

    Each round: active ⋈ full-state on (band, ptr == gid) — ONE
    shuffle — then a single count() decides convergence. Rows whose
    ptr has reached a sink RETIRE out of the loop (their mapping never
    changes again), so only the shrinking active set is re-joined and
    re-checkpointed each round; retired parts are checkpointed once.
    Same flat-plan discipline as the dedup connected-components loop."""
    from functools import reduce

    # nodes that appear as dst but have no own edge (virtual outlets
    # just outside the defined region) are absorbing: give them
    # explicit self-loops so the doubling join never drops rows
    nodes = edges.select("band", F.col("dst").alias("n")).distinct()
    absorbing = nodes.join(
        edges.select("band", F.col("gid").alias("n")), ["band", "n"], "left_anti"
    ).select(
        "band", F.col("n").alias("gid"), F.col("n").alias("ptr"),
        F.lit(0).cast("long").alias("dist"), F.lit(True).alias("done"),
        F.lit(False).alias("is_cell"),
    )
    state = edges.select(
        "band", "gid",
        F.col("dst").alias("ptr"),
        F.when(F.col("dst") == F.col("gid"), F.lit(0).cast("long"))
        .otherwise(F.lit(1).cast("long")).alias("dist"),
        (F.col("dst") == F.col("gid")).alias("done"),
        F.lit(True).alias("is_cell"),
    ).union(absorbing).localCheckpoint(eager=True)
    settled = [state.where(F.col("done"))]
    active = state.where(~F.col("done"))

    for _ in range(max_rounds):
        if active.isEmpty():
            break
        lookup = reduce(lambda a, b: a.union(b), settled + [active]).select(
            "band",
            F.col("gid").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("dist").alias("dist2"),
            F.col("done").alias("done2"),
        )
        nxt = active.join(lookup, ["band", "ptr"]).select(
            "band", "gid",
            F.col("ptr2").alias("ptr"),
            (F.col("dist") + F.col("dist2")).alias("dist"),
            F.col("done2").alias("done"),
            "is_cell",
        ).localCheckpoint(eager=True)
        settled.append(nxt.where(F.col("done")))
        active = nxt.where(~F.col("done"))
    else:
        if not active.isEmpty():
            raise RuntimeError(
                f"flow_basins did not converge in {max_rounds} doubling rounds"
            )
    return reduce(lambda a, b: a.union(b), settled).select(
        "band", "gid", F.col("ptr").alias("basin"), "dist", "is_cell"
    )


def basin_summary(basins: DataFrame) -> DataFrame:
    """Per-basin rollup over REAL cells (virtual-outlet rows carry
    the labels but are not themselves cells): cell count, farthest
    cell (hydraulic length in hops), and a position-weighted checksum
    of membership."""
    return basins.where(F.col("is_cell")).groupBy("band", "basin").agg(
        F.count("*").alias("n_cells"),
        F.max("dist").alias("max_dist"),
        F.sum("dist").alias("sum_dist"),
        F.sum(F.col("gid") % F.lit(1_000_003)).alias("wsum_gid"),
    )
