"""do_mosaic — the end-to-end mosaic dataflow (the reference's doMosaic,
mosaic.py:111-224, re-planned as one declarative Spark job).

Reference phases -> Spark stages:

  imginfodict (serial metadata scan)   -> footprints dim table (given)
  projection (agreement check)         -> validate_projections()
  analysis (grid/tiles/join/worklist)  -> Catalyst logical plan:
                                          extent agg + tile relation +
                                          cell-keyed/broadcast spatial join
  domosaic (threads + queue + cache)   -> ONE shuffle into
                                          groupBy(band, tile).applyInArrow
  stats / pyramids (single pass)       -> emitted by the same kernel
  ordered write                        -> repartitionByRange + sorted sink

The reader threads, block queue, block cache and per-file countdown of
the reference (structures.py:141-242) all dissolve into the shuffle: the
groupBy IS the rendezvous that the reference's BlockCache polls for
(mosaic.py:364-366).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .plans import grid as gridmod
from .plans.grid import OutputGrid, make_tile_relation, overview_levels
from .plans.spatial_join import assign_inputs
from .operators.stitch import make_stitch_fn
from .operators.stats import finalize_stats
from .schema import STITCH_SCHEMA


class MoaProjectionError(Exception):
    """Input rasters disagree on projection / resolution / alignment
    (reference reproj.py:274-275)."""


@dataclass
class MosaicConfig:
    blocksize: int = 1024
    src_blocksize: int = 256           # chunk size of the blocks fact table
    min_overview_size: int = 1024
    nullval: float | None = None       # default: from priority-0 input
    strategy: str = "broadcast"        # 'broadcast' | 'cell'
    cell_size_px: int = 4096
    salt: int = 1
    check_projections: bool = True
    check_blocks: bool = False         # integrity prepass over the blocks table
    with_overviews: bool = True
    kernel: str = "arrow"              # 'arrow' (applyInArrow) | 'pandas'
    # 'last' (reference) | 'nearest' (kNN ext) | 'blend' (feathered
    # edge-blending: overlap pixels weighted by distance to each
    # contributor's source edge — nodata-aware, seams fade)
    merge_policy: str = "last"
    blend_feather: int = 64            # feather width (px) for 'blend'
    stitch_salt: int = 1               # >1: two-stage salted merge for hot tiles
    # tiles with fewer contributors than this skip the two-stage path
    # (stage 1 only pays off when contributors >> buckets);
    # None -> 2 * stitch_salt
    stitch_hot_threshold: int | None = None
    # incremental sink partition count: touched-tile rewrites replace a
    # whole `part=` partition, so each partition holds ~1/sink_parts of
    # the mosaic. Size it so one partition is a bounded rewrite at the
    # target tile count (an Iceberg MERGE sink removes the trade-off).
    sink_parts: int = 16
    # storage-side relayout routing (sources/relayout.py): when set,
    # do_mosaic stitches off this bucketed work table whenever it holds
    # EXACTLY this corpus (footprint fingerprint + geometry match, see
    # mosaic_via_relayout) — the repeated-run path with zero stitch
    # Exchange. Absent/stale table: it is (re)built first, which makes
    # that do_mosaic call eager (one write action). stitch_salt > 1 or
    # an explicit grid that mismatches the table fall back to the
    # direct path silently — results are identical either way.
    relayout_table: str | None = None
    relayout_buckets: int = 128


@dataclass
class MosaicResult:
    grid: OutputGrid
    levels: list
    tiles: DataFrame        # level-0 mosaic tiles with stat partials
    overviews: DataFrame    # pyramid fragments (level > 0)
    stats: DataFrame        # per-band finalized stats
    assignments: DataFrame  # the spatial-join output (J1 relation)
    stitched: DataFrame = field(repr=False, default=None)
    # the tiling blocksize the result was built with — consumers that
    # need global pixel ids (write_derived's basins product) must use
    # THIS, not a shape inferred from tiles: a raster one tile-row tall
    # absorbs the remainder into row 0, so max(ysize) underestimates it
    blocksize: int | None = None


def _summary_row(footprints: DataFrame, with_fingerprint: bool = False):
    """ONE aggregate over the footprint dim table carrying everything
    do_mosaic needs up front: P6/P7 agreement counts, the
    priority-first struct, the A1 extent, and (optionally) the relayout
    fingerprint — one driver round trip where validate + grid +
    fingerprint used to be three (guide §5: collects are full driver
    round trips; batch them)."""
    first = F.min_by(
        F.struct(
            "projection", "x_res", "y_res", "x0", "y0",
            "n_bands", "nullval", "dtype",
        ),
        F.col("priority"),
    )
    aggs = [
        F.countDistinct("projection").alias("n_proj"),
        F.countDistinct("x_res").alias("n_xres"),
        F.countDistinct("y_res").alias("n_yres"),
        first.alias("first"),
        F.min(F.col("x0")).alias("x_min"),
        F.max(F.col("x0") + F.col("ncols") * F.col("x_res")).alias("x_max"),
        F.min(F.col("y0") - F.col("nrows") * F.col("y_res")).alias("y_min"),
        F.max(F.col("y0")).alias("y_max"),
    ]
    if with_fingerprint:
        from .sources.relayout import fingerprint_agg_cols

        aggs.extend(fingerprint_agg_cols())
    return footprints.agg(*aggs).collect()[0]


def _require_first(row):
    if row["first"] is None:
        raise ValueError(
            "no media footprints found — the documents table has no media "
            "spans (or the footprints table is empty)"
        )
    return row["first"]


def _check_projection_row(footprints: DataFrame, row) -> None:
    """P6/P7 checks over a collected summary row + the one residual
    alignment scan (which needs the first input's origin, so it cannot
    fold into the same aggregate)."""
    f = _require_first(row)
    if row["n_proj"] > 1:
        raise MoaProjectionError("Projection mis-match between inputs")
    if row["n_xres"] > 1 or row["n_yres"] > 1:
        raise MoaProjectionError("Pixel size mis-match between inputs")
    # isAligned (reproj.py:117-127): |round(d/res) - d/res| < 1e-4
    def misaligned(coord, origin, res):
        factor = F.abs(F.col(coord) - F.lit(origin)) / F.lit(res)
        return F.abs(F.round(factor) - factor) >= 0.0001

    bad = footprints.where(
        misaligned("x0", f["x0"], f["x_res"]) | misaligned("y0", f["y0"], f["y_res"])
    ).limit(1).count()
    if bad:
        raise MoaProjectionError("Grid mis-alignment between inputs")


def _grid_from_summary(row, nullval: float | None) -> OutputGrid:
    """OutputGrid from a collected summary row — the same int(round())
    derivation as plans.grid.make_output_grid (A1)."""
    f = _require_first(row)
    x_res, y_res = float(f["x_res"]), float(f["y_res"])
    return OutputGrid(
        x_min=float(row["x_min"]),
        y_max=float(row["y_max"]),
        x_res=x_res,
        y_res=y_res,
        ncols=int(round((row["x_max"] - row["x_min"]) / x_res)),
        nrows=int(round((row["y_max"] - row["y_min"]) / y_res)),
        n_bands=int(f["n_bands"]),
        nullval=float(f["nullval"]) if nullval is None else float(nullval),
        dtype=str(f["dtype"]),
        projection=str(f["projection"]),
    )


def validate_projections(footprints: DataFrame) -> None:
    """P6/P7 — all inputs must agree on projection and pixel size, and be
    grid-aligned to the first input (reference reproj.py:72-127).
    One tiny aggregate over the dim table; raises MoaProjectionError.
    """
    _check_projection_row(footprints, _summary_row(footprints))


def validate_blocks(footprints: DataFrame, blocks: DataFrame) -> None:
    """Optional integrity prepass: every (media_ref, band) a footprint
    declares must have pixel rows in the blocks table. Without this, a
    missing source silently drops its tiles from the output (the
    single-node reference would instead fail opening the file,
    mosaic.py:253). One aggregate scan of the blocks table's key columns
    — column pruning keeps the pixel payload unread."""
    expected = footprints.select(
        "media_ref",
        F.explode(F.sequence(F.lit(1), F.col("n_bands"))).alias("band"),
    )
    missing = expected.join(
        blocks.select("media_ref", "band").distinct(),
        on=["media_ref", "band"],
        how="left_anti",
    )
    got = missing.limit(5).collect()
    if got:
        refs = ", ".join(f"{r.media_ref}/b{r.band}" for r in got)
        raise ValueError(f"blocks table missing pixel data for: {refs} ...")


def _contributor_chunks(assignments: DataFrame, blocks: DataFrame, src_bs: int) -> DataFrame:
    """Explode each (tile, contributor) to its covering source chunks and
    join the pixel payloads.

    The clamp (mosaic.py:258-263) happens here in column math so only
    chunks inside the source extent are pulled; this is the engine's
    partition-pruning analog — the join keys (media_ref, b_row, b_col)
    push down to the blocks table's partitioning at scale.
    """
    a = assignments.select(
        "*",
        F.greatest(F.col("in_top"), F.lit(0)).alias("top1"),
        F.greatest(F.col("in_left"), F.lit(0)).alias("left1"),
        F.least(F.col("in_top") + F.col("in_ysize"), F.col("src_nrows")).alias("bottom1"),
        F.least(F.col("in_left") + F.col("in_xsize"), F.col("src_ncols")).alias("right1"),
    ).where((F.col("bottom1") > F.col("top1")) & (F.col("right1") > F.col("left1")))
    a = a.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("top1") / src_bs).cast("int"),
                ((F.col("bottom1") - 1) / src_bs).cast("int"),
            )
        ).alias("b_row"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                (F.col("left1") / src_bs).cast("int"),
                ((F.col("right1") - 1) / src_bs).cast("int"),
            )
        ).alias("b_col"),
    )
    joined = a.join(blocks, on=["media_ref", "b_row", "b_col"], how="inner")
    # Clip each chunk to its tile's read window JVM-side BEFORE the big
    # shuffle (the predicate/projection-pushdown analog of the reference's
    # windowed ReadAsArray, mosaic.py:264): chunks straddling a tile edge
    # would otherwise ship ~2x their useful bytes to the stitch stage.
    #
    # Clip by ACCESS PATTERN (the focal emitter's lesson, guide §1.2):
    #   * row-range clip — rows are contiguous in the row-major payload,
    #     so it is ONE substr/slice per chunk; always applied.
    #   * column clip — strided. A thin kept strip (width <= half the
    #     chunk) is emitted as one ROW PER SOURCE ROW, each a single
    #     codegen'd substr/slice: linear in the strip bytes, no
    #     interpreted per-element lambda (the previous hex-join bridge
    #     measured ~5 MB/s — 200x below memcpy). Wide chunks keep their
    #     full width (clipping a few edge columns would rebuild the
    #     whole chunk to save almost nothing) and the stitch kernel's
    #     existing clamp (operators/stitch.py _fold_arrow_group) drops
    #     the spare columns on paste. Measured on the bench corpus:
    #     216 MB shipped vs 210 MB under the full per-pixel clip (+3%)
    #     at ~5x less clip CPU.
    rt = F.greatest(F.col("b_top"), F.col("top1"))
    rb = F.least(F.col("b_top") + F.col("b_ysize"), F.col("bottom1"))
    cl = F.greatest(F.col("b_left"), F.col("left1"))
    cr = F.least(F.col("b_left") + F.col("b_xsize"), F.col("right1"))
    from .pixels import pixels_are_binary

    binary = pixels_are_binary(blocks)
    cols_untouched = (cl == F.col("b_left")) & (cr == F.col("b_left") + F.col("b_xsize"))
    col_clip = ~cols_untouched & ((cr - cl) * 2 <= F.col("b_xsize"))
    if binary:
        row_clipped = F.col("pixels").substr(
            (rt - F.col("b_top")) * F.col("b_xsize") * 2 + 1,
            (rb - rt) * F.col("b_xsize") * 2,
        )
    else:
        row_clipped = F.slice(
            F.col("pixels"),
            (rt - F.col("b_top")) * F.col("b_xsize") + 1,
            (rb - rt) * F.col("b_xsize"),
        )
    # interior chunks (the vast majority at production tile sizes) pass
    # through untouched; row-only clips are one contiguous slice
    untouched = (
        (rt == F.col("b_top"))
        & (rb == F.col("b_top") + F.col("b_ysize"))
        & cols_untouched
    )
    # ONE subtree: a conditional generate fans thin-strip chunks out to
    # their per-row slices (_sr = source row) and passes every other
    # chunk through once (_sr null) — a where/union split here would
    # duplicate the whole join subtree (blocks scanned and joined twice
    # per action; observed in the physical plan)
    alive = joined.where((rb > rt) & (cr > cl)).select(
        "*",
        F.explode(
            F.when(col_clip, F.sequence(rt, rb - 1))
            .otherwise(F.array(F.lit(None).cast("int")))
        ).alias("_sr"),
    )
    src_off = (F.col("_sr") - F.col("b_top")) * F.col("b_xsize") + (cl - F.col("b_left"))
    strip_px = (
        F.col("pixels").substr(src_off * 2 + 1, (cr - cl) * 2)
        if binary
        else F.slice(F.col("pixels"), src_off + 1, cr - cl)
    )
    is_strip = F.col("_sr").isNotNull()
    # one withColumns: every expression binds to the ORIGINAL chunk
    # geometry columns (sequential withColumn would rebind cl/cr to
    # already-replaced b_left/b_xsize)
    return (
        alive.withColumns({
            "pixels": F.when(
                is_strip, strip_px
            ).otherwise(F.when(untouched, F.col("pixels")).otherwise(row_clipped)),
            "b_xsize": F.when(is_strip, cr - cl).otherwise(F.col("b_xsize")),
            "b_left": F.when(is_strip, cl).otherwise(F.col("b_left")),
            "b_ysize": F.when(is_strip, F.lit(1)).otherwise(rb - rt),
            "b_top": F.when(is_strip, F.col("_sr")).otherwise(rt),
        })
        .drop("top1", "left1", "bottom1", "right1", "_sr")
    )


def _null_tile_rows(
    spark: SparkSession,
    gap_tiles: DataFrame,
    grid: OutputGrid,
    levels: list,
    with_overviews: bool,
    binary: bool = False,
) -> DataFrame:
    """Tiles intersecting no input: pure-null fill, written without any
    read or merge (reference mosaic.py:351-359) — synthesized JVM-side
    (array_repeat / hex-repeat for the u2 layout), never touching
    Python."""
    from .pixels import repeat_u2

    nullval = int(grid.nullval)
    bands = spark.range(1, grid.n_bands + 1).select(F.col("id").cast("int").alias("band"))
    g = gap_tiles.crossJoin(bands)

    def null_rows(sel_level, y_off, x_off, nr, nc):
        n_px = (nr * nc).cast("int")
        px = (
            repeat_u2(nullval, n_px) if binary
            else F.array_repeat(F.lit(nullval), n_px)
        )
        return [
            F.lit(sel_level).cast("int").alias("level"),
            F.col("band"),
            F.col("tile_row"),
            F.col("tile_col"),
            y_off.cast("int").alias("y_off"),
            x_off.cast("int").alias("x_off"),
            nr.cast("int").alias("ysize"),
            nc.cast("int").alias("xsize"),
            px.alias("pixels"),
            F.lit(0).cast("long").alias("px_count"),
            F.lit(0.0).alias("px_sum"),
            F.lit(0.0).alias("px_ssq"),
            F.lit(None).cast("double").alias("px_min"),
            F.lit(None).cast("double").alias("px_max"),
        ]

    out = g.select(*null_rows(0, F.col("top"), F.col("left"), F.col("ysize"), F.col("xsize")))
    if with_overviews:
        for lvl in levels:
            o = lvl // 2
            ov_nr, ov_nc = gridmod.overview_shape(grid.nrows, grid.ncols, lvl)
            frag_nr = F.when(F.col("ysize") > o, ((F.col("ysize") - 1 - o) / lvl + 1).cast("int")).otherwise(F.lit(0))
            frag_nc = F.when(F.col("xsize") > o, ((F.col("xsize") - 1 - o) / lvl + 1).cast("int")).otherwise(F.lit(0))
            y_off = (F.col("top") / lvl).cast("int")
            x_off = (F.col("left") / lvl).cast("int")
            nr = F.least(frag_nr, F.lit(ov_nr) - y_off)
            nc = F.least(frag_nc, F.lit(ov_nc) - x_off)
            frag = g.where((nr > 0) & (nc > 0)).select(*null_rows(lvl, y_off, x_off, nr, nc))
            out = out.unionByName(frag)
    return out


def do_mosaic(
    spark: SparkSession,
    footprints: DataFrame,
    blocks: DataFrame,
    config: MosaicConfig | None = None,
    grid: OutputGrid | None = None,
    tile_row_range: tuple[int, int] | None = None,
    tile_keys: DataFrame | None = None,
) -> MosaicResult:
    """Run the full mosaic dataflow. Returns lazy DataFrames — callers
    trigger execution by writing or collecting.

    ``grid`` pins the output grid explicitly (incremental runs must keep
    tile coordinates stable while footprints accumulate); by default it
    is derived from the footprints via the extent aggregate.

    ``tile_row_range=(lo, hi)`` / ``tile_keys`` restrict the run to a
    subset of output tiles (half-open row range / explicit
    (tile_row, tile_col) key set). The restriction is applied to the
    INPUT tile relation, before the spatial join and the stitch groupBy
    — Catalyst cannot push a filter through FlatMapGroupsInArrow, so
    filtering the kernel's *output* (what resume/incremental previously
    did) re-stitches the entire mosaic and discards most of it. Pruning
    the input side makes a k-of-n batch cost ~1/n of a full run."""
    config = config or MosaicConfig()
    if config.merge_policy not in ("last", "nearest", "blend"):
        raise ValueError(
            f"unknown merge_policy {config.merge_policy!r} "
            "(expected 'last', 'nearest' or 'blend')"
        )
    from .session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    routable = config.relayout_table is not None and config.stitch_salt == 1
    # ONE summary collect covers validation + grid derivation + the
    # relayout fingerprint; only the alignment scan needs a second job
    row = (
        _summary_row(footprints, with_fingerprint=routable)
        if (config.check_projections or grid is None or routable)
        else None
    )
    if config.check_projections:
        _check_projection_row(footprints, row)
    if config.check_blocks:
        validate_blocks(footprints, blocks)

    if routable:
        # storage-side fast path: stitch off the bucketed relayout when
        # the table carries exactly this corpus; (re)build it when not.
        # Returns None only when routing cannot apply (explicit grid
        # mismatch) — then the direct dataflow below runs as usual.
        from .sources.relayout import footprints_fingerprint, mosaic_via_relayout

        res = mosaic_via_relayout(
            spark, footprints, blocks, config,
            grid=grid, tile_row_range=tile_row_range, tile_keys=tile_keys,
            fingerprint=footprints_fingerprint(footprints, row=row),
            grid_hint=(
                _grid_from_summary(row, config.nullval) if grid is None else None
            ),
        )
        if res is not None:
            return res

    if grid is None:
        grid = _grid_from_summary(row, config.nullval)
    levels = (
        overview_levels(grid.nrows, grid.ncols, config.min_overview_size)
        if config.with_overviews
        else []
    )
    tiles = make_tile_relation(spark, grid, config.blocksize)
    if tile_row_range is not None:
        lo, hi = tile_row_range
        tiles = tiles.where(
            (F.col("tile_row") >= F.lit(int(lo))) & (F.col("tile_row") < F.lit(int(hi)))
        )
    if tile_keys is not None:
        # semi-join against the requested tile set; left small by
        # construction (a micro-batch's touched tiles), AQE converts it
        # to a broadcast join at runtime when it is.
        tiles = tiles.join(
            tile_keys.select("tile_row", "tile_col").distinct(),
            on=["tile_row", "tile_col"],
            how="left_semi",
        )
    assignments = assign_inputs(
        tiles,
        footprints,
        grid,
        strategy=config.strategy,
        **({"cell_size_px": config.cell_size_px, "salt": config.salt,
            "blocksize": config.blocksize}
           if config.strategy == "cell" else {}),
    )

    # pixel layout is detected from the blocks table (pixels.py): the
    # u2 binary layout halves the bytes of the stitch shuffle and the
    # sink; the stitch output mirrors the input layout.
    from .pixels import pixels_are_binary
    from .schema import PARTIAL_MERGE_SCHEMA_U2, STITCH_SCHEMA_U2

    binary = pixels_are_binary(blocks)
    stitch_schema = STITCH_SCHEMA_U2 if binary else STITCH_SCHEMA

    work = _contributor_chunks(assignments, blocks, config.src_blocksize)

    if config.stitch_salt > 1:
        # Two-stage salted merge for hot tiles (many contributors): the
        # writer-serialization analog the reference cannot split. Stage
        # 1 partial-merges CONTIGUOUS priority buckets per tile (the
        # fold is associative given order preservation — see
        # operators/stitch.py:make_partial_merge_fn_arrow); stage 2 is
        # the normal stitch over one synthetic contributor per bucket.
        if config.merge_policy not in ("last", "blend"):
            # 'nearest' carries per-pixel arg-min state a value-only
            # partial cannot decompose
            raise ValueError("stitch_salt requires merge_policy 'last' or 'blend'")
        if config.kernel != "arrow":
            raise ValueError("stitch_salt requires kernel='arrow'")
        from pyspark.sql import Window

        from .operators.stitch import make_partial_merge_fn_arrow
        from .schema import PARTIAL_MERGE_SCHEMA

        # Bucket by ntile over the priority ORDER, not raw priority
        # values: sparse priorities (gaps, timestamps) would otherwise
        # degenerate into one bucket per contributor. ntile keeps
        # buckets contiguous in priority order (the exactness condition)
        # and evenly sized. Window over the footprints dim table only
        # (tiny); broadcast-joined onto the work relation.
        # NOTE: the window below is one eager-free narrow plan, but
        # do_mosaic stays lazy — no action is triggered here.
        buckets = footprints.select(
            "priority",
            (F.ntile(config.stitch_salt).over(Window.orderBy("priority")) - 1).alias(
                "_ssalt"
            ),
        )
        # HOT/COLD split: stage 1 only pays off when a tile has many
        # more contributors than buckets — a 2-contributor tile routed
        # through it does a pointless extra kernel pass. Contributor
        # counts come from the (small) assignments relation; hot rows
        # take the two-stage path, cold rows go straight to the final
        # stitch (union is schema-aligned: the stitch kernel consumes
        # the PARTIAL_MERGE column set either way).
        threshold = (
            config.stitch_hot_threshold
            if config.stitch_hot_threshold is not None
            else max(2, 2 * config.stitch_salt)
        )
        counts = assignments.groupBy("tile_row", "tile_col").agg(
            F.count("*").alias("_nc")
        )
        work_c = work.join(counts, on=["tile_row", "tile_col"], how="inner")
        work_hot = work_c.where(F.col("_nc") >= threshold).drop("_nc")
        work_cold = work_c.where(F.col("_nc") < threshold).drop("_nc")
        salted = work_hot.join(F.broadcast(buckets), on="priority", how="inner")
        if config.merge_policy == "blend":
            # blend partials are (wsum, wvsum) int64 canvases — the
            # commutative decomposition (stitch.py:
            # make_blend_partial_fn_arrow); cold rows ride along with
            # null canvases and fold as raw contributors in stage 2
            from .operators.stitch import make_blend_partial_fn_arrow
            from .schema import BLEND_PARTIAL_SCHEMA, BLEND_PARTIAL_SCHEMA_U2

            bp_schema = BLEND_PARTIAL_SCHEMA_U2 if binary else BLEND_PARTIAL_SCHEMA
            merged_hot = salted.groupBy(
                "band", "tile_row", "tile_col", "_ssalt"
            ).applyInArrow(
                make_blend_partial_fn_arrow(grid, config.blend_feather, binary=binary),
                bp_schema,
            )
            cold = work_cold
            for c in ("wsum", "wvsum"):
                cold = cold.withColumn(c, F.lit(None).cast("array<bigint>"))
            work = merged_hot.unionByName(
                cold.select(*[f.name for f in bp_schema.fields])
            )
        else:
            pm_schema = PARTIAL_MERGE_SCHEMA_U2 if binary else PARTIAL_MERGE_SCHEMA
            merged_hot = salted.groupBy(
                "band", "tile_row", "tile_col", "_ssalt"
            ).applyInArrow(
                make_partial_merge_fn_arrow(grid, binary=binary), pm_schema
            )
            work = merged_hot.unionByName(
                work_cold.select(*[f.name for f in pm_schema.fields])
            )

    grouped = work.groupBy("band", "tile_row", "tile_col")
    if config.stitch_salt > 1 and config.merge_policy == "blend":
        from .operators.stitch import make_blend_stitch_fn_arrow

        stitched = grouped.applyInArrow(
            make_blend_stitch_fn_arrow(grid, levels, config.blend_feather,
                                       binary=binary),
            stitch_schema,
        )
    elif config.kernel == "arrow":
        from .operators.stitch import make_stitch_fn_arrow

        stitched = grouped.applyInArrow(
            make_stitch_fn_arrow(grid, levels, config.merge_policy, binary=binary,
                                 feather=config.blend_feather),
            stitch_schema,
        )
    elif config.kernel == "pandas":
        stitched = grouped.applyInPandas(
            make_stitch_fn(grid, levels, config.merge_policy, binary=binary,
                           feather=config.blend_feather),
            stitch_schema,
        )
    else:
        raise ValueError(f"unknown kernel: {config.kernel}")

    gap_tiles = tiles.join(
        assignments.select("tile_row", "tile_col").distinct(),
        on=["tile_row", "tile_col"],
        how="left_anti",
    )
    stitched = stitched.unionByName(
        _null_tile_rows(spark, gap_tiles, grid, levels, config.with_overviews,
                        binary=binary)
    )

    tiles_out = stitched.where(F.col("level") == 0)
    overviews = stitched.where(F.col("level") > 0)
    stats = finalize_stats(stitched)
    return MosaicResult(
        grid=grid,
        levels=levels,
        tiles=tiles_out,
        overviews=overviews,
        stats=stats,
        assignments=assignments,
        stitched=stitched,
        blocksize=config.blocksize,
    )


def write_mosaic(result: MosaicResult, path: str, partitions: int | None = None) -> None:
    """Ordered sink (O2/S6): deterministic row-major tile order via range
    partitioning + in-partition sort — the distributed form of the
    reference's strictly ordered single-writer loop (mosaic.py:337-375).

    The stitched relation feeds three sinks (tiles, overviews, stats);
    persisting it makes the scan+join+stitch run ONCE — the single-pass
    stats+pyramids property the reference gained in v1.0.1
    (docs/releasenotes.md:12-15)."""
    persisted = result.stitched is not None
    if persisted:
        result.stitched.persist()
    try:
        _write_mosaic_sinks(result, path, partitions)
    finally:
        if persisted:
            result.stitched.unpersist()


def _write_mosaic_sinks(result: MosaicResult, path: str, partitions: int | None) -> None:
    t = result.tiles
    if partitions:
        t = t.repartitionByRange(partitions, "band", "tile_row", "tile_col")
    else:
        t = t.repartitionByRange("band", "tile_row", "tile_col")
    t.sortWithinPartitions("band", "tile_row", "tile_col").write.mode("overwrite").parquet(
        f"{path}/tiles"
    )
    if result.levels:
        o = result.overviews.repartitionByRange("level", "band", "tile_row", "tile_col")
        o.sortWithinPartitions("level", "band", "tile_row", "tile_col").write.mode(
            "overwrite"
        ).parquet(f"{path}/overviews")
    result.stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def write_derived(
    result: MosaicResult, path: str, products: list[str] | tuple[str, ...]
) -> dict:
    """gdaldem-style derived products from a mosaic result, each
    written as an ordered partitioned table under ``path/<name>``:

    - ``hillshade``: Horn shade 0..255 per pixel (functions/focal.py)
    - ``terrain``: quantized percent slope + D8 flow direction arrays
    - ``basins``: per-cell watershed labels (gid, basin, dist) from
      pointer-doubling flow routing (functions/hydro.py)

    All three derive from ONE terrain/halo computation where possible;
    returns {product: row_count}."""
    from .functions.focal import hillshade, terrain
    from .functions.hydro import d8_edges, flow_basins

    g = result.grid
    t = result.tiles
    if "level" in t.columns:
        t = t.where(F.col("level") == 0)
    tiles = t.select("band", "tile_row", "tile_col", "ysize", "xsize", "pixels")

    unknown = set(products) - {"hillshade", "terrain", "basins"}
    if unknown:
        raise ValueError(f"unknown derived products: {sorted(unknown)}")

    out: dict = {}
    terr = None
    if {"terrain", "basins"} & set(products):
        terr = terrain(
            tiles, xres=g.x_res, yres=g.y_res, nullval=int(g.nullval)
        ).localCheckpoint(eager=False)

    spark = tiles.sparkSession

    def sink(df, name, order):
        df.repartitionByRange(*order).sortWithinPartitions(*order).write.mode(
            "overwrite"
        ).parquet(f"{path}/{name}")
        # count from the written files — re-counting df would re-run
        # the whole derived computation
        out[name] = spark.read.parquet(f"{path}/{name}").count()

    key = ["band", "tile_row", "tile_col"]
    for p in products:
        if p == "hillshade":
            sink(hillshade(tiles, xres=g.x_res, yres=g.y_res,
                           nullval=int(g.nullval)), p, key)
        elif p == "terrain":
            sink(terr, p, key)
        elif p == "basins":
            # configured blocksize, threaded through MosaicResult: a
            # shape inferred from row-0 tiles is wrong for rasters one
            # tile-row tall (the absorbed remainder makes row 0 taller/
            # shorter than the configured blocksize, silently skewing
            # every global pixel id). Inference remains only as a
            # fallback for hand-built results.
            if result.blocksize is not None:
                bs = int(result.blocksize)
            else:
                bs = int(t.where(F.col("tile_row") == 0)
                         .agg(F.max("ysize")).collect()[0][0])
            edges = d8_edges(terr, g_ncols=int(g.ncols), blocksize=bs)
            sink(flow_basins(edges).where(F.col("is_cell")).select(
                "band", "gid", "basin", "dist"), p, ["band", "gid"])
    return out
