"""Tile-aligned relayout — the storage-side scale optimization.

The mosaic's one wide shuffle moves every contributing pixel into its
(band, tile) group. When the same corpus is stitched repeatedly —
different merge policies, incremental re-merges, pyramid rebuilds,
resumed runs — that shuffle can be paid ONCE: materialize the
join+clip output ("work relation") as a table **bucketed by the stitch
group keys**. Spark's bucketed scan then satisfies the grouped-map
operator's ClusteredDistribution directly: the stitch plan contains NO
Exchange (verified in tests; only an in-partition Sort remains).

This is the table-world analog of pre-tiled raster inputs, and the
concrete form of "partition the storage by spatial cell" from BENCH.md.
Measured: stitch from bucketed layout ~3-5x faster than with the
shuffle, and the relayout cost amortizes across every subsequent run.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..mosaic import MosaicConfig, MosaicResult, _contributor_chunks, _null_tile_rows
from ..operators.stats import finalize_stats
from ..operators.stitch import make_stitch_fn, make_stitch_fn_arrow
from ..plans.grid import OutputGrid, make_output_grid, make_tile_relation, overview_levels
from ..plans.spatial_join import assign_inputs
from ..schema import STITCH_SCHEMA


def fingerprint_agg_cols() -> list:
    """The two aggregate columns of the catalog fingerprint, exposed so
    do_mosaic can fold them into its single footprint-summary pass
    (one collect for validation + extent + fingerprint instead of
    three — guide §5: the driver should do almost no data work, and
    every collect is a full driver round trip)."""
    cols = [
        "media_ref", "priority", "x0", "y0", "x_res", "y_res",
        "ncols", "nrows", "n_bands", "dtype", "nullval", "projection",
    ]
    h = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
    return [
        F.count("*").alias("_fp_n"),
        F.sum(
            F.conv(F.substring(h, 1, 14), 16, 10).cast("decimal(38,0)")
        ).alias("_fp_s"),
    ]


def footprints_fingerprint(footprints: DataFrame, row=None) -> str:
    """Order-independent fingerprint of a footprint catalog: row count
    plus the sum of a per-row md5 prefix over every geometry- and
    priority-bearing column. One tiny aggregate over the dim table
    (or zero, when the caller hands in an already-collected summary
    ``row`` carrying the fingerprint_agg_cols aliases); lets do_mosaic
    prove a relayout table holds EXACTLY the corpus it was asked to
    mosaic before trusting the stored layout."""
    if row is None:
        row = footprints.agg(*fingerprint_agg_cols()).collect()[0]
    return f"{row['_fp_n']}:{row['_fp_s']}"


def relayout_to_table(
    spark: SparkSession,
    footprints: DataFrame,
    blocks: DataFrame,
    table: str,
    config: MosaicConfig | None = None,
    n_buckets: int = 64,
    grid: OutputGrid | None = None,
    fingerprint: str | None = None,
) -> OutputGrid:
    """Materialize the tile-aligned work relation as a bucketed table
    (pays the wide shuffle once). Also stores the output grid + config
    in ``<table>_meta`` so later stitches reconstruct the exact plan.
    ``grid``/``fingerprint`` let a caller that already aggregated the
    footprint dim table (do_mosaic's summary pass) skip re-collecting
    it."""
    config = config or MosaicConfig()
    if fingerprint is None:
        fingerprint = footprints_fingerprint(footprints)
    from ..session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    if grid is None:
        grid = make_output_grid(footprints, config.nullval)
    tiles = make_tile_relation(spark, grid, config.blocksize)
    assignments = assign_inputs(
        tiles, footprints, grid,
        strategy=config.strategy,
        **({"cell_size_px": config.cell_size_px, "salt": config.salt,
            "blocksize": config.blocksize}
           if config.strategy == "cell" else {}),
    )
    work = _contributor_chunks(assignments, blocks, config.src_blocksize)
    for t in (table, f"{table}_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _drop_stale_location(spark, t)
    (
        # repartition on the bucket key first: without it every write
        # task holds rows of most buckets and emits one file per
        # (task, bucket) pair — hundreds of tiny files whose create/
        # commit overhead dominates the build and whose open overhead
        # taxes every later bucketed scan (guide §6: small files hurt
        # twice). Hash-partitioned n_buckets ways, each task writes
        # exactly its own bucket: n_buckets files total.
        work.repartition(n_buckets, "band", "tile_row", "tile_col")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "band", "tile_row", "tile_col")
        .sortBy("band", "tile_row", "tile_col")
        .saveAsTable(table)
    )
    _write_meta(spark, table, grid, config, n_buckets, fingerprint)
    return grid


def _write_meta(
    spark: SparkSession, table: str, grid: OutputGrid, config: MosaicConfig,
    n_buckets: int, fingerprint: str | None = None,
) -> None:
    meta = dict(
        x_min=grid.x_min, y_max=grid.y_max, x_res=grid.x_res, y_res=grid.y_res,
        ncols=grid.ncols, nrows=grid.nrows, n_bands=grid.n_bands,
        nullval=grid.nullval, dtype=grid.dtype, projection=grid.projection,
        blocksize=config.blocksize, min_overview_size=config.min_overview_size,
        n_buckets=n_buckets, src_blocksize=config.src_blocksize,
        fingerprint=fingerprint,
    )
    spark.createDataFrame([(json.dumps(meta),)], "meta string").write.mode(
        "overwrite"
    ).saveAsTable(f"{table}_meta")


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Filesystem path where a managed table's files live (or would
    live), resolved through the CATALOG's database location — never by
    string-pasting ``<warehouse>/<name>``: Spark stores ``db.tbl`` at
    ``<warehouse>/<db>.db/<tbl>``, so the paste would miss surviving
    files after a restart, create a fresh empty table, and (with the
    seen-refs checkpoint still marking old batches seen) silently drop
    their work rows from every later stitch. Returns None when the
    database is unknown to this catalog or its location is not a local
    filesystem (a real catalog survives restarts, so the re-register
    path is moot there)."""
    from urllib.parse import urlparse

    parts = table.lower().split(".")
    if len(parts) > 1 and parts[0] == "spark_catalog":
        parts = parts[1:]
    if len(parts) == 1:
        db, tbl = spark.catalog.currentDatabase().lower(), parts[0]
    elif len(parts) == 2:
        db, tbl = parts
    else:
        return None
    try:
        db_loc = spark.catalog.getDatabase(db).locationUri
    except Exception:
        return None  # database unknown to this (restarted) catalog
    p = urlparse(db_loc)
    if p.scheme in ("", "file"):
        return f"{p.path or db_loc}/{tbl}"
    return None


def _reregister_relayout(spark: SparkSession, table: str, loc: str) -> None:
    """Re-attach a relayout table whose files survived a session restart
    (the default in-memory catalog forgets managed tables; the warehouse
    directory does NOT — deleting it would silently lose every
    pre-restart batch's work rows). Recreates the catalog entries over
    the existing files, bucket spec from the surviving meta json."""
    import json as _json
    import os

    meta_loc = f"{loc}_meta"
    m = _json.loads(
        spark.read.parquet(meta_loc).collect()[0].meta
    )
    if not spark.catalog.tableExists(f"{table}_meta"):
        spark.sql(
            f"CREATE TABLE {table}_meta (meta string) USING parquet "
            f"LOCATION '{os.path.abspath(meta_loc)}'"
        )
    df = spark.read.parquet(loc)
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    nb = int(m.get("n_buckets", 64))
    spark.sql(
        f"CREATE TABLE {table} ({ddl}) USING parquet "
        f"CLUSTERED BY (band, tile_row, tile_col) "
        f"SORTED BY (band, tile_row, tile_col) INTO {nb} BUCKETS "
        f"LOCATION '{os.path.abspath(loc)}'"
    )


def ensure_relayout_table(
    spark: SparkSession,
    table: str,
    grid: OutputGrid,
    blocks: DataFrame,
    config: MosaicConfig,
    n_buckets: int = 64,
) -> None:
    """Create an EMPTY bucketed work table pinned to ``grid`` if it does
    not exist yet — the incremental mosaic appends each micro-batch's
    work rows into it (relayout_append) and stitches touched tiles with
    no Exchange. The schema (including the pixel layout) is derived
    from a zero-row run of the join+clip plan over ``blocks``.

    If the catalog does not know the table but its warehouse files
    exist (a restarted session with the default in-memory catalog),
    the table is RE-REGISTERED over the surviving files — never
    truncated: those files are the accumulated incremental state, and
    the seen-refs checkpoint would prevent re-appending them."""
    import os

    if spark.catalog.tableExists(table):
        return
    loc = _table_location(spark, table)
    if loc is not None and os.path.isdir(loc) and os.listdir(loc):
        _reregister_relayout(spark, table, loc)
        return
    tiles = make_tile_relation(spark, grid, config.blocksize).limit(0)
    assignments = assign_inputs(
        tiles,
        _empty_footprints(spark), grid, strategy="broadcast",
    )
    empty = _contributor_chunks(assignments, blocks.limit(0), config.src_blocksize)
    (
        empty.write.mode("overwrite")
        .bucketBy(n_buckets, "band", "tile_row", "tile_col")
        .sortBy("band", "tile_row", "tile_col")
        .saveAsTable(table)
    )
    _write_meta(spark, table, grid, config, n_buckets)


def _empty_footprints(spark: SparkSession):
    from ..schema import FOOTPRINTS_SCHEMA

    return spark.createDataFrame([], FOOTPRINTS_SCHEMA)


def relayout_append(
    spark: SparkSession,
    footprints_new: DataFrame,
    blocks: DataFrame,
    table: str,
) -> None:
    """Append the work rows of NEW footprints into an existing bucketed
    relayout table (same grid, same bucket spec — from the table meta).
    Replaying an append after a crash duplicates rows; the stitch is
    idempotent under duplicates (a duplicate row re-pastes the same
    pixels within its priority run), so resume semantics hold — compact
    by re-running relayout_to_table when growth matters."""
    m = _load_meta(spark, table)
    grid = OutputGrid(
        x_min=m["x_min"], y_max=m["y_max"], x_res=m["x_res"], y_res=m["y_res"],
        ncols=m["ncols"], nrows=m["nrows"], n_bands=m["n_bands"],
        nullval=m["nullval"], dtype=m["dtype"], projection=m["projection"],
    )
    cfg = MosaicConfig(blocksize=int(m["blocksize"]))
    tiles = make_tile_relation(spark, grid, cfg.blocksize)
    assignments = assign_inputs(tiles, footprints_new, grid, strategy="broadcast")
    work = _contributor_chunks(
        assignments, blocks, int(m.get("src_blocksize", 256))
    )
    nb = int(m.get("n_buckets", 64))
    (
        # same one-file-per-bucket discipline as relayout_to_table
        work.repartition(nb, "band", "tile_row", "tile_col")
        .write.mode("append")
        .bucketBy(nb, "band", "tile_row", "tile_col")
        .sortBy("band", "tile_row", "tile_col")
        .saveAsTable(table)
    )


def _drop_stale_location(spark: SparkSession, table: str) -> None:
    """A managed table's files outlive the in-memory session catalog;
    a fresh session's DROP TABLE then leaves a stale location that
    blocks re-creation (LOCATION_ALREADY_EXISTS). Local warehouses only
    — object-store warehouses use a real persistent catalog."""
    import shutil

    loc = _table_location(spark, table)
    if loc is not None:
        shutil.rmtree(loc, ignore_errors=True)


def _load_meta(spark: SparkSession, table: str) -> dict:
    return json.loads(spark.table(f"{table}_meta").collect()[0].meta)


def _table_accessible(spark: SparkSession, table: str) -> bool:
    """True when ``table`` (and its meta) can be read — either already
    registered, or re-registered here over files that survived a
    session restart (same recovery path as ensure_relayout_table)."""
    import os

    if spark.catalog.tableExists(table) and spark.catalog.tableExists(f"{table}_meta"):
        return True
    loc = _table_location(spark, table)
    if loc is not None and os.path.isdir(loc) and os.listdir(loc):
        try:
            _reregister_relayout(spark, table, loc)
            return True
        except Exception:
            return False
    return False


def _grid_from_meta(m: dict) -> OutputGrid:
    return OutputGrid(
        x_min=m["x_min"], y_max=m["y_max"], x_res=m["x_res"], y_res=m["y_res"],
        ncols=m["ncols"], nrows=m["nrows"], n_bands=m["n_bands"],
        nullval=m["nullval"], dtype=m["dtype"], projection=m["projection"],
    )


def mosaic_via_relayout(
    spark: SparkSession,
    footprints: DataFrame,
    blocks: DataFrame,
    config: MosaicConfig,
    grid: OutputGrid | None = None,
    tile_row_range: tuple[int, int] | None = None,
    tile_keys: DataFrame | None = None,
    fingerprint: str | None = None,
    grid_hint: OutputGrid | None = None,
) -> MosaicResult | None:
    """do_mosaic's storage-side routing (config.relayout_table).

    Stitches off the bucketed table when it provably holds this exact
    corpus (footprint fingerprint + tiling geometry match); (re)builds
    the table first when it is absent or stale — that one call is
    eager, every later call is the zero-Exchange repeated-run path.
    Returns None when routing cannot apply (caller pinned an explicit
    grid the table was not built for — the direct dataflow handles it;
    an auto-build would derive its own grid and silently diverge).
    ``fingerprint``/``grid_hint`` are pre-aggregated values from
    do_mosaic's single footprint-summary pass (grid_hint is the grid
    the summary DERIVED, as opposed to ``grid``, which the caller
    PINNED)."""
    table = config.relayout_table
    fp = (
        fingerprint
        if fingerprint is not None
        else footprints_fingerprint(footprints)
    )
    usable = False
    if _table_accessible(spark, table):
        m = _load_meta(spark, table)
        usable = (
            m.get("fingerprint") == fp
            and int(m["blocksize"]) == config.blocksize
            and int(m.get("src_blocksize", 256)) == config.src_blocksize
            and int(m["min_overview_size"]) == config.min_overview_size
            and (grid is None or _grid_from_meta(m) == grid)
        )
    if not usable:
        if grid is not None:
            return None
        relayout_to_table(
            spark, footprints, blocks, table, config,
            n_buckets=config.relayout_buckets,
            grid=grid_hint, fingerprint=fp,
        )
    return stitch_from_relayout(
        spark, table, config, tile_row_range=tile_row_range, tile_keys=tile_keys
    )


def stitch_from_relayout(
    spark: SparkSession,
    table: str,
    config: MosaicConfig | None = None,
    tile_row_range: tuple[int, int] | None = None,
    tile_keys: DataFrame | None = None,
) -> MosaicResult:
    """Stitch straight off the bucketed work table — no join, no
    Exchange. ``config`` may override kernel/merge_policy/overviews; the
    grid and tiling geometry come from the relayout metadata.

    ``tile_row_range=(lo, hi)`` restricts the stitch to a tile-row
    range; the predicate lands in the bucketed SCAN (PushedFilters), so
    a resumable batch off a relayout reads only its own rows AND skips
    the shuffle — the cheapest possible re-stitch. ``tile_keys`` (small
    DataFrame of (tile_row, tile_col)) restricts to an explicit tile
    set via a broadcast semi-join, which preserves the bucketed
    distribution — the incremental path's touched-tile re-stitch."""
    config = config or MosaicConfig()
    if config.stitch_salt > 1:
        raise ValueError(
            "stitch_salt is not supported on the relayout path yet — the "
            "bucketed layout already removes the stitch shuffle; run "
            "do_mosaic for the two-stage salted merge"
        )
    from ..session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    m = _load_meta(spark, table)
    grid = OutputGrid(
        x_min=m["x_min"], y_max=m["y_max"], x_res=m["x_res"], y_res=m["y_res"],
        ncols=m["ncols"], nrows=m["nrows"], n_bands=m["n_bands"],
        nullval=m["nullval"], dtype=m["dtype"], projection=m["projection"],
    )
    blocksize = int(m["blocksize"])
    levels = (
        overview_levels(grid.nrows, grid.ncols, int(m["min_overview_size"]))
        if config.with_overviews
        else []
    )
    work = spark.table(table)
    if tile_row_range is not None:
        lo, hi = tile_row_range
        work = work.where(
            (F.col("tile_row") >= F.lit(int(lo))) & (F.col("tile_row") < F.lit(int(hi)))
        )
    if tile_keys is not None:
        keys = tile_keys.select("tile_row", "tile_col").distinct()
        work = work.join(F.broadcast(keys), on=["tile_row", "tile_col"], how="left_semi")
    # pixel layout follows the bucketed table (set when it was relaid)
    from ..pixels import pixels_are_binary
    from ..schema import STITCH_SCHEMA_U2

    binary = pixels_are_binary(work)
    stitch_schema = STITCH_SCHEMA_U2 if binary else STITCH_SCHEMA
    grouped = work.groupBy("band", "tile_row", "tile_col")
    if config.kernel == "arrow":
        stitched = grouped.applyInArrow(
            make_stitch_fn_arrow(grid, levels, config.merge_policy, binary=binary,
                                 feather=config.blend_feather),
            stitch_schema,
        )
    else:
        stitched = grouped.applyInPandas(
            make_stitch_fn(grid, levels, config.merge_policy, binary=binary,
                           feather=config.blend_feather),
            stitch_schema,
        )

    tiles = make_tile_relation(spark, grid, blocksize)
    if tile_row_range is not None:
        lo, hi = tile_row_range
        tiles = tiles.where(
            (F.col("tile_row") >= F.lit(int(lo))) & (F.col("tile_row") < F.lit(int(hi)))
        )
    if tile_keys is not None:
        tiles = tiles.join(
            F.broadcast(tile_keys.select("tile_row", "tile_col").distinct()),
            on=["tile_row", "tile_col"],
            how="left_semi",
        )
    gap_tiles = tiles.join(
        work.select("tile_row", "tile_col").distinct(),
        on=["tile_row", "tile_col"],
        how="left_anti",
    )
    stitched = stitched.unionByName(
        _null_tile_rows(spark, gap_tiles, grid, levels, config.with_overviews,
                        binary=binary)
    )
    return MosaicResult(
        grid=grid,
        levels=levels,
        tiles=stitched.where(F.col("level") == 0),
        overviews=stitched.where(F.col("level") > 0),
        stats=finalize_stats(stitched),
        assignments=work.select(
            "tile_row", "tile_col", "media_ref", "priority"
        ).distinct(),
        stitched=stitched,
        blocksize=blocksize,
    )
