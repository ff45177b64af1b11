#!/usr/bin/env python
"""Benchmark driver: headline queries + two-parallelism scaling evidence.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "mosaic": {"tiles": N, "tiles_per_sec": X, "px_per_sec": X},
   "scaling": {"cores_lo": 8, "cores_hi": 32, "tiles_per_sec_lo": X,
               "tiles_per_sec_hi": X, "efficiency": X}}

The scaling section evidences the north rule's two-cluster-size
criterion in-sandbox: the identical mosaic job on identical input at
local[8] vs local[32]; efficiency = (T8 / T32) / 4.

Each Spark master runs in its own subprocess (a JVM cannot change
master in-process). Env knobs: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_GRID (rasters per side, default 5),
SPARK_GRAFT_BENCH_RSIZE (raster px, default 2048).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_GRID = int(os.environ.get("SPARK_GRAFT_BENCH_GRID", "5"))
BENCH_RSIZE = int(os.environ.get("SPARK_GRAFT_BENCH_RSIZE", "2048"))
BLOCKSIZE = 1024
SRC_BS = 512


def _spark(cores: int):
    from moamosaic_spark.session import get_spark

    return get_spark(
        f"local[{cores}]",
        app_name=f"moamosaic-bench-{cores}",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )


def bench_mosaic_corpus(spark):
    """Deterministic bench corpus: BENCH_GRID^2 rasters of BENCH_RSIZE^2
    px, 16-px overlaps, pixel = local column index — generated entirely
    JVM-side (transform/sequence), no Python in the data path. Stored in
    the u2 packed layout (2 B/px — the engine's production layout)."""
    from pyspark.sql import functions as F

    from moamosaic_spark.pixels import pack_row_u2

    n, rs = BENCH_GRID, BENCH_RSIZE
    stride = rs - 16
    k = F.col("id").cast("int")
    fp = spark.range(n * n).select(
        F.concat(F.lit("r"), k.cast("string")).alias("media_ref"),
        k.alias("priority"),
        (F.lit(300000.0) + (k % n) * (stride * 10.0)).alias("x0"),
        (F.lit(7000000.0) - F.floor(k / n) * (stride * 10.0)).alias("y0"),
        F.lit(10.0).alias("x_res"),
        F.lit(10.0).alias("y_res"),
        F.lit(rs).alias("ncols"),
        F.lit(rs).alias("nrows"),
        F.lit(1).alias("n_bands"),
        F.lit("uint16").alias("dtype"),
        F.lit(0.0).alias("nullval"),
        F.lit("EPSG:32756").alias("projection"),
    )
    nb = (rs + SRC_BS - 1) // SRC_BS
    b = (
        fp.select("media_ref", "ncols", "nrows")
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("b_row"))
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("b_col"))
        .repartition(max(CPUS, 8))
        .select(
            "media_ref",
            F.lit(1).alias("band"),
            "b_row",
            "b_col",
            (F.col("b_row") * SRC_BS).alias("b_top"),
            (F.col("b_col") * SRC_BS).alias("b_left"),
            F.least(F.lit(SRC_BS), F.col("nrows") - F.col("b_row") * SRC_BS).alias("b_ysize"),
            F.least(F.lit(SRC_BS), F.col("ncols") - F.col("b_col") * SRC_BS).alias("b_xsize"),
        )
        .where((F.col("b_ysize") > 0) & (F.col("b_xsize") > 0))
        .withColumn(
            "pixels",
            # value = local column index, identical per chunk row
            pack_row_u2(F.col("b_left"), F.col("b_xsize"), F.col("b_ysize")),
        )
    )
    return fp, b


CORPUS_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_CORPUS",
    f"/tmp/moamosaic_bench_corpus_g{BENCH_GRID}_r{BENCH_RSIZE}_u2",
)


def ensure_corpus(spark) -> None:
    """Materialize the bench corpus to parquet once — the engine under
    test reads stored tables (as the reference reads stored rasters);
    generation cost is excluded from the measurement."""
    marker = Path(CORPUS_DIR) / "_DONE"
    if marker.exists():
        return
    fp, blocks = bench_mosaic_corpus(spark)
    fp.write.mode("overwrite").parquet(f"{CORPUS_DIR}/footprints")
    blocks.write.mode("overwrite").parquet(f"{CORPUS_DIR}/blocks")
    marker.touch()


def run_mosaic(spark) -> dict:
    from pyspark.sql import functions as F

    from moamosaic_spark.mosaic import MosaicConfig, do_mosaic

    ensure_corpus(spark)
    fp = spark.read.parquet(f"{CORPUS_DIR}/footprints")
    blocks = spark.read.parquet(f"{CORPUS_DIR}/blocks")
    cfg = MosaicConfig(
        blocksize=BLOCKSIZE,
        src_blocksize=SRC_BS,
        min_overview_size=1024,
        strategy="cell",
        cell_size_px=4096,
    )
    t0 = time.time()
    res = do_mosaic(spark, fp, blocks, cfg)
    row = res.tiles.agg(
        F.count("*").alias("tiles"), F.sum("px_count").alias("px")
    ).collect()[0]
    dt = time.time() - t0
    return {
        "seconds": dt,
        "tiles": int(row["tiles"]),
        "valid_px": int(row["px"]),
        "tiles_per_sec": round(row["tiles"] / dt, 3),
        "px_per_sec": round(row["px"] / dt, 1),
    }


def run_mosaic_default(spark) -> dict:
    """The engine's PRIMARY mosaic number: do_mosaic with
    config.relayout_table set — the production default for any corpus
    mosaicked more than once. The first call pays the wide shuffle
    into the bucketed table (reported as build_seconds, amortized);
    every later call is the zero-Exchange stitch, timed median-of-3.
    Per-tile md5 equality vs the direct (shuffle-every-run) path is
    asserted in-leg before any number is reported."""
    from pyspark.sql import functions as F

    from moamosaic_spark.mosaic import MosaicConfig, do_mosaic

    ensure_corpus(spark)
    fp = spark.read.parquet(f"{CORPUS_DIR}/footprints")
    blocks = spark.read.parquet(f"{CORPUS_DIR}/blocks")
    cfg = MosaicConfig(
        blocksize=BLOCKSIZE, src_blocksize=SRC_BS, min_overview_size=1024,
        strategy="cell", cell_size_px=4096,
        relayout_table="bench_default_relayout", relayout_buckets=128,
    )
    t0 = time.time()
    do_mosaic(spark, fp, blocks, cfg).tiles.count()  # builds the layout
    build_s = time.time() - t0

    runs, tiles, px = [], 0, 0
    for _ in range(3):
        t0 = time.time()
        row = do_mosaic(spark, fp, blocks, cfg).tiles.agg(
            F.count("*").alias("tiles"), F.sum("px_count").alias("px")
        ).collect()[0]
        runs.append(time.time() - t0)
        tiles, px = int(row["tiles"]), int(row["px"])
    runs.sort()
    sec = runs[1]

    key = ["band", "tile_row", "tile_col"]
    direct_cfg = MosaicConfig(
        blocksize=BLOCKSIZE, src_blocksize=SRC_BS, min_overview_size=1024,
        strategy="cell", cell_size_px=4096,
    )
    d = do_mosaic(spark, fp, blocks, direct_cfg).tiles.select(
        *key, F.md5(F.col("pixels")).alias("h")
    )
    r = do_mosaic(spark, fp, blocks, cfg).tiles.select(
        *key, F.md5(F.col("pixels")).alias("h")
    )
    bad = d.unionAll(r).groupBy(*key, "h").count().where(F.col("count") != 2).count()
    if bad:
        raise AssertionError(f"relayout-backed != direct on {bad} tile payloads")
    return {
        "mode": "relayout-auto (do_mosaic default with relayout_table)",
        "seconds": sec,
        "runs_seconds": [round(t, 3) for t in runs],
        "build_seconds": round(build_s, 3),
        "tiles": tiles,
        "valid_px": px,
        "tiles_per_sec": round(tiles / sec, 3),
        "px_per_sec": round(px / sec, 1),
        "equal_to_direct": True,
    }


def run_mosaic_relayout(spark) -> dict:
    """The zero-Exchange storage path, build + stitch split out.

    ``relayout_to_table`` pays the mosaic's one wide shuffle ONCE into a
    table bucketed by the stitch group keys; ``stitch_from_relayout``
    then satisfies the grouped-map distribution straight off the
    bucketed scan (plan-asserted Exchange-free in test_relayout). The
    stitch leg is the engine's repeated-run cost — the number to hold
    against BASELINE.md's 26 tiles/s — while the build leg is the
    amortized one-time cost. Equality vs the direct do_mosaic path is
    asserted per-tile (md5 of the packed payload) before returning."""
    from pyspark.sql import functions as F

    from moamosaic_spark.mosaic import MosaicConfig, do_mosaic
    from moamosaic_spark.sources.relayout import relayout_to_table, stitch_from_relayout

    ensure_corpus(spark)
    fp = spark.read.parquet(f"{CORPUS_DIR}/footprints")
    blocks = spark.read.parquet(f"{CORPUS_DIR}/blocks")
    cfg = MosaicConfig(
        blocksize=BLOCKSIZE,
        src_blocksize=SRC_BS,
        min_overview_size=1024,
        strategy="cell",
        cell_size_px=4096,
    )
    table = "bench_relayout"
    t0 = time.time()
    # buckets > tiles: the bucketed scan runs one task per bucket, so
    # finer buckets balance per-tile stitch cost across cores (100
    # tiles into 64 buckets puts 4 tiles in a straggler bucket)
    relayout_to_table(spark, fp, blocks, table, cfg, n_buckets=128)
    build_s = time.time() - t0

    runs, tiles, px = [], 0, 0
    for _ in range(3):
        t0 = time.time()
        res = stitch_from_relayout(spark, table, cfg)
        row = res.tiles.agg(
            F.count("*").alias("tiles"), F.sum("px_count").alias("px")
        ).collect()[0]
        runs.append(time.time() - t0)
        tiles, px = int(row["tiles"]), int(row["px"])
    runs.sort()
    stitch_s = runs[1]

    # tiles == direct: every (band, tile_row, tile_col) must carry a
    # bit-identical packed payload on both paths
    key = ["band", "tile_row", "tile_col"]
    d = do_mosaic(spark, fp, blocks, cfg).tiles.select(
        *key, F.md5(F.col("pixels")).alias("h")
    )
    r = stitch_from_relayout(spark, table, cfg).tiles.select(
        *key, F.md5(F.col("pixels")).alias("h")
    )
    bad = (
        d.unionAll(r).groupBy(*key, "h").count().where(F.col("count") != 2).count()
    )
    if bad:
        raise AssertionError(f"relayout != direct on {bad} tile payloads")
    return {
        "build_seconds": round(build_s, 3),
        "stitch_seconds": round(stitch_s, 3),
        "stitch_runs_seconds": [round(t, 3) for t in runs],
        "tiles": tiles,
        "valid_px": px,
        "stitch_tiles_per_sec": round(tiles / stitch_s, 3),
        "stitch_px_per_sec": round(px / stitch_s, 1),
        "equal_to_direct": True,
    }


def run_headline(spark) -> dict:
    """Headline operator suite at SF_DIR."""
    from moamosaic_spark import driver_contract as DC

    out = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)

    sf = SF_DIR
    timed("mosaic_pipeline", lambda: DC.q_mosaic_tile_checksums(spark, sf).collect())
    timed("mosaic_join", lambda: DC.q_mosaic_assignments(spark, sf).count())
    timed("dedup_minhash", lambda: DC.q_dedup_minhash_sig(spark, sf).count())
    timed("dedup_ngram", lambda: DC.q_dedup_ngram_pairs(spark, sf).count())
    timed("dedup_simhash", lambda: DC.q_dedup_simhash(spark, sf).count())
    timed("dedup_lsh", lambda: DC.q_dedup_lsh_candidates(spark, sf).count())
    timed("embedding_topk", lambda: DC.q_embedding_topk(spark, sf).collect())
    timed(
        "embedding_neardup",
        lambda: DC.q_embedding_neardup_pairs(spark, sf).count(),
    )
    timed("doc_token_stats", lambda: DC.q_doc_token_stats(spark, sf).count())
    timed(
        "mosaic_resampled",
        lambda: DC.q_mosaic_resampled_checksums(spark, sf).collect(),
    )
    timed("mosaic_warped", lambda: DC.q_mosaic_warped_checksums(spark, sf).collect())
    timed("lineitem_agg", lambda: DC.q_lineitem_agg(spark, sf).collect())
    timed("events_hourly", lambda: DC.q_events_hourly(spark, sf).count())
    timed("orders_by_nation", lambda: DC.q_orders_by_nation(spark, sf).collect())
    return out


def warmup(spark) -> None:
    """Tiny untimed mosaic to JIT codegen paths, fork Python workers and
    open Arrow channels, so the timed run measures steady state."""
    from moamosaic_spark.mosaic import MosaicConfig, do_mosaic
    from moamosaic_spark.sources import synth

    rasters = synth.golden_pair(128, 128)
    docs, fp, blocks = synth.corpus_to_spark(spark, rasters)
    res = do_mosaic(
        spark, fp, blocks, MosaicConfig(blocksize=64, src_blocksize=256, min_overview_size=32)
    )
    res.tiles.count()


def run_mosaic_median(spark, n: int = 3) -> dict:
    """Median-of-n to damp host-level noise (shared VM: identical runs
    vary up to 3x; see BENCH.md)."""
    runs = [run_mosaic(spark) for _ in range(n)]
    runs.sort(key=lambda r: r["seconds"])
    med = runs[len(runs) // 2]
    med["runs_seconds"] = [round(r["seconds"], 3) for r in runs]
    return med


def run_join_scaling(spark) -> dict:
    """Planning-stage scaling job: 2.56M output tiles x 10k footprints
    through the cell-keyed spatial join — pure JVM codegen + one narrow
    shuffle, no pixel payload. This is the CPU-bound half of the engine;
    see BENCH.md for why pixel stages cannot scale on this host."""
    from pyspark.sql import functions as F

    from moamosaic_spark.plans.grid import OutputGrid, make_tile_relation
    from moamosaic_spark.plans.spatial_join import assign_inputs

    grid = OutputGrid(
        x_min=300000.0, y_max=7000000.0, x_res=10.0, y_res=10.0,
        ncols=102400, nrows=102400, n_bands=1, nullval=0,
        dtype="uint16", projection="EPSG:32756",
    )
    tiles = make_tile_relation(spark, grid, 64)
    k = F.col("id").cast("int")
    fp = spark.range(10000).select(
        F.concat(F.lit("r"), k.cast("string")).alias("media_ref"),
        k.alias("priority"),
        (F.lit(300000.0) + (k % 100) * 10200.0).alias("x0"),
        (F.lit(7000000.0) - F.floor(k / 100) * 10200.0).alias("y0"),
        F.lit(10.0).alias("x_res"), F.lit(10.0).alias("y_res"),
        F.lit(1024).alias("ncols"), F.lit(1024).alias("nrows"),
    )
    asg = assign_inputs(tiles, fp, grid, strategy="cell", cell_size_px=512, blocksize=64)
    asg.count()  # warm
    ts = []
    n = 0
    for _ in range(3):
        t0 = time.time()
        n = asg.count()
        ts.append(time.time() - t0)
    ts.sort()
    return {
        "seconds": ts[1],
        "rows": n,
        "rows_per_sec": round(n / ts[1], 1),
        "runs_seconds": [round(t, 3) for t in ts],
    }


def run_relayout_stitch_scaling(spark) -> dict:
    """Scaling leg for the production repeated-run path: the
    zero-Exchange stitch off the bucketed relayout, timed at this
    child's core count (median-of-3; table build is untimed setup —
    each child owns its in-memory catalog so it builds its own copy).
    This is the pixel job whose wall-clock beats BASELINE.md, so its
    4-vs-16-core pair is the north-rule evidence that matters most."""
    from pyspark.sql import functions as F

    from moamosaic_spark.mosaic import MosaicConfig
    from moamosaic_spark.sources.relayout import relayout_to_table, stitch_from_relayout

    ensure_corpus(spark)
    fp = spark.read.parquet(f"{CORPUS_DIR}/footprints")
    blocks = spark.read.parquet(f"{CORPUS_DIR}/blocks")
    cfg = MosaicConfig(
        blocksize=BLOCKSIZE, src_blocksize=SRC_BS, min_overview_size=1024,
        strategy="cell", cell_size_px=4096,
    )
    table = "bench_relayout_scale"
    relayout_to_table(spark, fp, blocks, table, cfg, n_buckets=128)
    stitch_from_relayout(spark, table, cfg).tiles.agg(F.sum("px_count")).collect()  # warm
    ts, tiles = [], 0
    for _ in range(3):
        t0 = time.time()
        row = stitch_from_relayout(spark, table, cfg).tiles.agg(
            F.count("*").alias("t"), F.sum("px_count").alias("px")
        ).collect()[0]
        ts.append(time.time() - t0)
        tiles = int(row["t"])
    ts.sort()
    return {
        "seconds": ts[1],
        "tiles": tiles,
        "tiles_per_sec": round(tiles / ts[1], 3),
        "runs_seconds": [round(t, 3) for t in ts],
    }


def run_focal(spark) -> dict:
    """Focal-family bench: Horn hillshade over the stitched bench
    mosaic (~104 Mpx in 1024^2 tiles) through the ONE-shuffle halo
    exchange (functions/focal.py: each tile ships its payload plus
    eight O(perimeter) border fragments; one groupBy assembles the
    padded array; the kernel is nine shifted-view numpy ops). Input
    tiles are materialized untimed; the timed region is the exchange +
    kernel — the number a 100 TB DEM pipeline would scale by."""
    from pyspark.sql import functions as F

    from moamosaic_spark.functions.focal import hillshade
    from moamosaic_spark.mosaic import MosaicConfig, do_mosaic

    ensure_corpus(spark)
    fp = spark.read.parquet(f"{CORPUS_DIR}/footprints")
    blocks = spark.read.parquet(f"{CORPUS_DIR}/blocks")
    cfg = MosaicConfig(
        blocksize=BLOCKSIZE, src_blocksize=SRC_BS, min_overview_size=1024,
        strategy="cell", cell_size_px=4096,
    )
    tiles = do_mosaic(spark, fp, blocks, cfg).tiles.select(
        "band", "tile_row", "tile_col", "ysize", "xsize", "pixels"
    ).persist()
    tiles.count()  # materialize the input outside the timed region

    def run():
        # a FRESH plan per run: re-collecting one DataFrame object lets
        # the DAG scheduler reuse the halo exchange's map output and
        # would time only the reduce side
        return hillshade(tiles, xres=10.0, yres=10.0, nullval=0).agg(
            F.count("*").alias("tiles"),
            F.sum(F.col("ysize").cast("long") * F.col("xsize")).alias("px"),
            F.sum(F.size(F.filter(F.col("pixels"), lambda x: x != -1))).alias(
                "defined_px"),
        ).collect()[0]

    run()  # warm
    ts, nt, px, dpx = [], 0, 0, 0
    for _ in range(3):
        t0 = time.time()
        row = run()
        ts.append(time.time() - t0)
        nt, px, dpx = int(row["tiles"]), int(row["px"]), int(row["defined_px"])
    ts.sort()

    # in-leg correctness (untimed): one interior tile recomputed
    # driver-side from its collected 3x3 tile neighborhood must match
    # the distributed output bit-for-bit — gates halo placement AND
    # the kernel before the number is reported
    import numpy as np

    from moamosaic_spark.functions.focal import HS_LX, HS_LY, HS_LZ

    tr0, tc0 = 5, 5
    nb = {}
    for r in tiles.where(
        F.col("tile_row").between(tr0 - 1, tr0 + 1)
        & F.col("tile_col").between(tc0 - 1, tc0 + 1)
    ).collect():
        nb[(r.tile_row, r.tile_col)] = np.frombuffer(
            bytes(r.pixels), "<u2").astype(np.int64).reshape(r.ysize, r.xsize)
    ctr = nb[(tr0, tc0)]
    ys_, xs_ = ctr.shape
    padded = np.zeros((ys_ + 2, xs_ + 2), np.int64)
    padded[1:-1, 1:-1] = ctr
    padded[0, 1:-1] = nb[(tr0 - 1, tc0)][-1, :]
    padded[-1, 1:-1] = nb[(tr0 + 1, tc0)][0, :]
    padded[1:-1, 0] = nb[(tr0, tc0 - 1)][:, -1]
    padded[1:-1, -1] = nb[(tr0, tc0 + 1)][:, 0]
    padded[0, 0] = nb[(tr0 - 1, tc0 - 1)][-1, -1]
    padded[0, -1] = nb[(tr0 - 1, tc0 + 1)][-1, 0]
    padded[-1, 0] = nb[(tr0 + 1, tc0 - 1)][0, -1]
    padded[-1, -1] = nb[(tr0 + 1, tc0 + 1)][0, 0]
    v = [padded[i:i + ys_, j:j + xs_] for i in range(3) for j in range(3)]
    allv = np.ones((ys_, xs_), bool)
    for m in v:
        allv &= m != 0
    tl, tm, trr, ml, _, mr, bl, bm, br = v
    gx = ((trr + 2 * mr + br) - (tl + 2 * ml + bl)) / 80.0
    gy = ((bl + 2 * bm + br) - (tl + 2 * tm + trr)) / 80.0
    num = HS_LZ - HS_LX * gx - HS_LY * gy
    den = np.sqrt(1.0 + gx * gx + gy * gy)
    exp = np.where(
        allv, np.floor(255.0 * np.maximum(num / den, 0.0) + 0.5).astype(np.int64), -1)
    got_row = hillshade(tiles, xres=10.0, yres=10.0, nullval=0).where(
        (F.col("tile_row") == tr0) & (F.col("tile_col") == tc0)).collect()[0]
    got = np.asarray(got_row.pixels, np.int64).reshape(got_row.ysize, got_row.xsize)
    if not (got == exp).all():
        raise AssertionError(
            f"hillshade tile ({tr0},{tc0}) differs from driver-side recompute "
            f"on {(got != exp).sum()} px")

    tiles.unpersist()
    return {
        "seconds": ts[1],
        "runs_seconds": [round(t, 3) for t in ts],
        "tiles": nt,
        "px": px,
        "defined_px": dpx,
        "tile_asserted": [tr0, tc0],
        "mpx_per_sec": round(px / ts[1] / 1e6, 2),
    }


def run_basin_scale(spark) -> dict:
    """Watershed segmentation at the 10^6.5-cell shape: a 2048^2
    deterministic DEM (smooth ridged surface + per-cell hash jitter ->
    real pit/valley structure), terrain D8 on 256^2 tiles, then
    pointer-doubling basin resolution. EVERY cell's (basin, dist) is
    asserted against an independent numpy pointer-doubling pass over
    the driver-side D8 grid before any number is reported. Rounds grow
    O(log max-path) — the number that stays flat at 100x the cells."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, IntegerType, StructField, StructType,
    )

    from moamosaic_spark.functions.focal import D8_DIRS, D8_FLAT, terrain
    from moamosaic_spark.functions.hydro import (
        basin_summary, d8_edges, flow_accumulation, flow_basins,
    )

    N = int(os.environ.get("SPARK_GRAFT_BASIN_N", "2048"))
    BS_ = 256
    yy, xx = np.mgrid[0:N, 0:N].astype(np.float64)
    surf = (
        3000
        + 900 * np.sin(yy / 97.0) * np.cos(xx / 71.0)
        + 500 * np.sin((yy + xx) / 211.0)
    )
    # deterministic per-cell jitter (splitmix-ish hash), +-8 units
    h = (yy.astype(np.int64) * 2654435761 + xx.astype(np.int64) * 40503) % 97
    grid = np.maximum((surf + (h - 48) / 6.0).astype(np.int64), 1)
    rows = []
    for tr in range(N // BS_):
        for tc in range(N // BS_):
            a = grid[tr * BS_:(tr + 1) * BS_, tc * BS_:(tc + 1) * BS_]
            rows.append((1, tr, tc, BS_, BS_, a.astype("<u2").tobytes()))
    schema = StructType([
        StructField("band", IntegerType()), StructField("tile_row", IntegerType()),
        StructField("tile_col", IntegerType()), StructField("ysize", IntegerType()),
        StructField("xsize", IntegerType()), StructField("pixels", BinaryType()),
    ])
    tiles = spark.createDataFrame(rows, schema).repartition(32).persist()
    tiles.count()

    t0 = time.time()
    terr = terrain(tiles, xres=10.0, yres=10.0, nullval=0)
    edges = d8_edges(terr, g_ncols=N, blocksize=BS_).persist()
    n_cells = edges.count()
    terrain_s = time.time() - t0
    t0 = time.time()
    basins = flow_basins(edges).persist()
    basins.count()
    basins_s = time.time() - t0
    summ = basin_summary(basins)
    n_basins = summ.count()

    # ---- independent truth: numpy pointer doubling over the d8 grid
    d8g = np.full((N, N), -1, np.int64)
    for r in terr.select("tile_row", "tile_col", "ysize", "xsize", "d8").collect():
        d8g[r.tile_row * BS_:r.tile_row * BS_ + r.ysize,
            r.tile_col * BS_:r.tile_col * BS_ + r.xsize] = np.asarray(
            r.d8, np.int64).reshape(r.ysize, r.xsize)
    gid = np.arange(N * N, dtype=np.int64)
    flat_d8 = d8g.ravel()
    ptr = gid.copy()
    dist = np.zeros(N * N, np.int64)
    defined = flat_d8 != -1
    flowing = defined & (flat_d8 != D8_FLAT)
    off = np.array([dy * N + dx for dy, dx in D8_DIRS], np.int64)
    ptr[flowing] = gid[flowing] + off[flat_d8[flowing]]
    dist[flowing] = 1
    # absorbing: undefined targets and pits keep ptr = self
    for _ in range(24):
        ptr2 = ptr[ptr]
        if (ptr2 == ptr).all():
            break
        dist = dist + np.where(ptr2 != ptr, dist[ptr], 0)
        ptr = ptr2
    pdf = basins.where("is_cell").select("gid", "basin", "dist").toPandas()
    pdf = pdf.sort_values("gid").reset_index(drop=True)
    ok = (
        len(pdf) == int(defined.sum())
        and (pdf["gid"].to_numpy() == gid[defined]).all()
        and (pdf["basin"].to_numpy() == ptr[defined]).all()
        and (pdf["dist"].to_numpy() == dist[defined]).all()
    )
    if not ok:
        raise AssertionError("basin labels/dists differ from numpy doubling truth")

    # ---- flow accumulation (Euler tour + list ranking), same edges
    t0 = time.time()
    accdf = flow_accumulation(edges).persist()
    accdf.count()
    acc_s = time.time() - t0
    # truth: vectorized reverse-topological accumulation by dist level
    hop = np.full(N * N, -1, np.int64)
    flow_idx = gid[flowing]
    hop[flow_idx] = flow_idx + off[flat_d8[flowing]]
    accv = np.zeros(N * N, np.int64)
    accv[defined] = 1
    for d in range(int(dist.max()), 0, -1):
        sel = defined & (dist == d)
        np.add.at(accv, hop[sel], accv[sel])
    apdf = accdf.where("is_cell").select("gid", "acc").toPandas()
    apdf = apdf.sort_values("gid").reset_index(drop=True)
    if not ((apdf["gid"].to_numpy() == gid[defined]).all()
            and (apdf["acc"].to_numpy() == accv[defined]).all()):
        raise AssertionError("flow accumulation differs from numpy truth")
    outl = {int(r.gid): int(r.acc) for r in accdf.where("NOT is_cell").collect()}
    exp_outl = {int(g): int(accv[g]) for g in np.unique(hop[hop >= 0])
                if not defined[g]}
    if outl != exp_outl:
        raise AssertionError("outlet throughput differs from numpy truth")
    max_acc = int(apdf["acc"].max())

    tiles.unpersist(); edges.unpersist(); basins.unpersist(); accdf.unpersist()
    return {
        "cells": int(n_cells),
        "basins": int(n_basins),
        "terrain_seconds": round(terrain_s, 3),
        "basins_seconds": round(basins_s, 3),
        "cells_per_sec": round(n_cells / basins_s, 1),
        "accumulation_seconds": round(acc_s, 3),
        "acc_cells_per_sec": round(n_cells / acc_s, 1),
        "max_accumulation": max_acc,
        "all_labels_asserted": True,
    }


def run_cc_scale(spark) -> dict:
    """Connected components at the 10^5-node shape the small fixtures
    don't reach: 64 chains of 1000 nodes (the O(log n)-round worst
    case for star contraction) + 4 stars of 10k nodes (the hub shape).
    Ground truth is id-derivable, so correctness is a full assertion,
    not a sample; the round count is asserted <= O(log^2 max-component)
    per Kiveris et al. 2014."""
    import math

    from pyspark.sql import functions as F

    from moamosaic_spark.functions.dedup import connected_components

    CH, CHL = 64, 1000          # 64 chains x 1000 nodes
    NS, SS = 4, 10_000          # 4 stars x 10k nodes
    base = 10_000_000
    chains = spark.range(CH * CHL).where((F.col("id") % CHL) != CHL - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stars = spark.range(NS * SS).where((F.col("id") % SS) != 0).select(
        (base + F.floor(F.col("id") / SS) * SS).alias("doc_a"),
        (base + F.col("id")).alias("doc_b"),
    )
    edges = (
        chains.unionByName(stars).repartition(max(CPUS, 8))
        .localCheckpoint(eager=True)  # input materialized outside timing
    )
    stats: dict = {}
    t0 = time.time()
    cc = connected_components(edges, stats=stats)
    expected = F.when(
        F.col("doc_id") >= base,
        base + F.floor((F.col("doc_id") - base) / SS) * SS,
    ).otherwise(F.floor(F.col("doc_id") / CHL) * CHL)
    row = cc.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cluster_id") != expected).cast("long")).alias("bad"),
    ).collect()[0]
    dt = time.time() - t0
    n_nodes = CH * CHL + NS * SS
    if row["bad"] or row["n"] != n_nodes:
        raise AssertionError(f"cc scale: {row['bad']} wrong labels, n={row['n']}")
    max_comp = max(CHL, SS)
    if stats["iterations"] > math.ceil(math.log2(max_comp)) ** 2:
        raise AssertionError(f"cc rounds {stats['iterations']} above O(log^2 n) bound")

    # skewed-star variant: ONE 10^5-degree hub — the shape that breaks
    # CC implementations which materialize a component's membership on
    # one row or reduce a hub's neighborhood in one task. Star
    # contraction's groupBy-min over the hub is a map-side-combinable
    # aggregate, so this must finish in O(1) rounds with all labels
    # exact.
    HUB_N = 100_000
    hub_base = 50_000_000
    skew_edges = spark.range(1, HUB_N + 1).select(
        F.lit(hub_base).alias("doc_a"), (hub_base + F.col("id")).alias("doc_b")
    ).repartition(max(CPUS, 8)).localCheckpoint(eager=True)
    skew_stats: dict = {}
    t0 = time.time()
    skew_cc = connected_components(skew_edges, stats=skew_stats)
    srow = skew_cc.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cluster_id") != hub_base).cast("long")).alias("bad"),
    ).collect()[0]
    skew_dt = time.time() - t0
    if srow["bad"] or srow["n"] != HUB_N + 1:
        raise AssertionError(f"cc skew: {srow['bad']} wrong labels, n={srow['n']}")

    # wide variant: same worst-case chain diameter, ~9x the nodes —
    # round count is set by log(max component), so per-round driver
    # latency (the 104k leg's bound) amortizes and nodes/s reflects
    # per-round O(|E|) throughput, the quantity that matters at 10^9
    # nodes. Ground truth stays id-derivable; every label asserted.
    BN, BS_ = 8, 100_000
    bbase = 100_000_000
    big_stars = spark.range(BN * BS_).where((F.col("id") % BS_) != 0).select(
        (bbase + F.floor(F.col("id") / BS_) * BS_).alias("doc_a"),
        (bbase + F.col("id")).alias("doc_b"),
    )
    wide_edges = (
        chains.unionByName(stars).unionByName(big_stars)
        .repartition(max(CPUS, 8)).localCheckpoint(eager=True)
    )
    wide_stats: dict = {}
    t0 = time.time()
    wcc = connected_components(wide_edges, stats=wide_stats)
    wexpected = (
        F.when(F.col("doc_id") >= bbase,
               bbase + F.floor((F.col("doc_id") - bbase) / BS_) * BS_)
        .when(F.col("doc_id") >= base,
              base + F.floor((F.col("doc_id") - base) / SS) * SS)
        .otherwise(F.floor(F.col("doc_id") / CHL) * CHL)
    )
    wrow = wcc.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cluster_id") != wexpected).cast("long")).alias("bad"),
    ).collect()[0]
    wide_dt = time.time() - t0
    wide_nodes = n_nodes + BN * BS_
    if wrow["bad"] or wrow["n"] != wide_nodes:
        raise AssertionError(f"cc wide: {wrow['bad']} wrong labels, n={wrow['n']}")
    if wide_stats["iterations"] > math.ceil(math.log2(BS_)) ** 2:
        raise AssertionError(f"cc wide rounds {wide_stats['iterations']} above bound")

    return {
        "seconds": round(dt, 3),
        "nodes": n_nodes,
        "edges": CH * (CHL - 1) + NS * (SS - 1),
        "iterations": stats["iterations"],
        "log2_bound": math.ceil(math.log2(max_comp)) ** 2,
        "nodes_per_sec": round(n_nodes / dt, 1),
        "all_labels_correct": True,
        "skew_hub": {
            "seconds": round(skew_dt, 3),
            "nodes": HUB_N + 1,
            "hub_degree": HUB_N,
            "iterations": skew_stats["iterations"],
            "nodes_per_sec": round((HUB_N + 1) / skew_dt, 1),
            "all_labels_correct": True,
        },
        "wide": {
            "seconds": round(wide_dt, 3),
            "nodes": wide_nodes,
            "edges": CH * (CHL - 1) + NS * (SS - 1) + BN * (BS_ - 1),
            "iterations": wide_stats["iterations"],
            "nodes_per_sec": round(wide_nodes / wide_dt, 1),
            "all_labels_correct": True,
        },
    }


def _memcpy_worker(_):
    import numpy as np

    a = np.ones(25_000_000, dtype=np.int32)
    t0 = time.time()
    for _ in range(3):
        b = a.copy()
        b[0] += 1
    return 3 * a.nbytes / (time.time() - t0) / 1e9


def run_dedup_scaling(spark, cores: int) -> dict:
    """Hash-bound scaling job: minhash signatures over replicated
    documents (tens of millions of portable md5 evaluations) — the
    CPU-dominated half of the training-pipeline operators. Plans vary
    per run (literal salt) to defeat Spark's shuffle reuse between
    timed repetitions."""
    from pyspark.sql import functions as F

    from moamosaic_spark.functions.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run(i: int) -> None:
        big = docs.crossJoin(spark.range(10).withColumnRenamed("id", "rep")).select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(f" v{i} "), F.col("rep").cast("string")
            ).alias("text"),
        ).repartition(cores * 2)
        minhash_signatures(big, num_hashes=4).agg(F.sum("h0")).collect()

    run(99)  # warm
    ts = []
    for i in range(3):
        t0 = time.time()
        run(i)
        ts.append(time.time() - t0)
    ts.sort()
    return {"seconds": ts[1], "runs_seconds": [round(t, 3) for t in ts]}


def _kernel_worker(args) -> float:
    """tiles/s of the Arrow stitch kernel on ONE in-memory group — no
    Spark, no shuffle, no Arrow IPC: the pure-compute ceiling of the
    pixel path. Runs in a worker process so the pool variant measures
    multi-core compute without JVM/Python-worker plumbing."""
    tile_px, n_contrib, reps = args
    import numpy as np
    import pyarrow as pa

    from moamosaic_spark.operators.stitch import make_stitch_fn_arrow
    from moamosaic_spark.plans.grid import OutputGrid

    grid = OutputGrid(
        x_min=300000.0, y_max=7000000.0, x_res=10.0, y_res=10.0,
        ncols=tile_px, nrows=tile_px, n_bands=1, nullval=0,
        dtype="uint16", projection="EPSG:32756",
    )
    bs = 512
    nb = tile_px // bs
    rng = np.random.default_rng(3)
    cols: dict = {c: [] for c in (
        "top", "left", "ysize", "xsize", "priority",
        "in_top", "in_left", "in_ysize", "in_xsize",
        "src_ncols", "src_nrows", "b_top", "b_left", "b_ysize", "b_xsize",
    )}
    payloads = []
    for p in range(n_contrib):
        for br in range(nb):
            for bc in range(nb):
                cols["top"].append(0); cols["left"].append(0)
                cols["ysize"].append(tile_px); cols["xsize"].append(tile_px)
                cols["priority"].append(p)
                cols["in_top"].append(0); cols["in_left"].append(0)
                cols["in_ysize"].append(tile_px); cols["in_xsize"].append(tile_px)
                cols["src_ncols"].append(tile_px); cols["src_nrows"].append(tile_px)
                cols["b_top"].append(br * bs); cols["b_left"].append(bc * bs)
                cols["b_ysize"].append(bs); cols["b_xsize"].append(bs)
                arr = rng.integers(1, 60000, size=(bs, bs), dtype="<u2")
                arr[:: 7 + p] = 0  # some null runs: exercise the mask path
                payloads.append(arr.tobytes())
    tbl = pa.table(
        {**{c: pa.array(v, pa.int32()) for c, v in cols.items()},
         "pixels": pa.array(payloads, pa.binary())}
    )
    fn = make_stitch_fn_arrow(grid, [], "last", binary=True)
    key = (1, 0, 0)
    fn(key, tbl)  # warm
    import time as _t

    t0 = _t.time()
    for _ in range(reps):
        fn(key, tbl)
    return reps / (_t.time() - t0)


def kernel_bench(nprocs: tuple[int, ...] = (1, 16), tile_px: int = 1024,
                 n_contrib: int = 3, reps: int = 20) -> dict:
    """Host-independent compute ceiling of the stitch kernel: tiles/s
    of make_stitch_fn_arrow on in-memory Arrow groups (1024^2 tile,
    n_contrib full-tile contributors in 512^2 chunks). The Spark
    pipeline can never beat procs x this number; the GAP between this
    ceiling and the measured pipeline quantifies shuffle + Arrow IPC +
    host bandwidth, separating engine design from host state."""
    import multiprocessing as mp

    out: dict = {"tile_px": tile_px, "n_contrib": n_contrib}
    for np_ in nprocs:
        with mp.Pool(np_) as pool:
            rates = pool.map(_kernel_worker, [(tile_px, n_contrib, reps)] * np_)
        agg = sum(rates)
        out[f"tiles_per_sec_p{np_}"] = round(agg, 2)
        out[f"mpx_per_sec_p{np_}"] = round(agg * tile_px * tile_px / 1e6, 1)
    return out


def memcpy_control(nproc: int) -> float:
    """Aggregate numpy copy bandwidth (GB/s) at nproc processes — the
    host-capability control for interpreting pixel-stage scaling."""
    import multiprocessing as mp

    with mp.Pool(nproc) as p:
        return round(sum(p.map(_memcpy_worker, range(nproc))), 2)


def child_main(mode: str, cores: int) -> None:
    spark = _spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if mode == "mosaic":
            warmup(spark)
            print("RESULT:" + json.dumps(run_mosaic_median(spark)))
        elif mode == "mosaicdefault":
            warmup(spark)
            print("RESULT:" + json.dumps(run_mosaic_default(spark)))
        elif mode == "relayout":
            warmup(spark)
            print("RESULT:" + json.dumps(run_mosaic_relayout(spark)))
        elif mode == "joinscale":
            print("RESULT:" + json.dumps(run_join_scaling(spark)))
        elif mode == "dedupscale":
            print("RESULT:" + json.dumps(run_dedup_scaling(spark, cores)))
        elif mode == "ccscale":
            print("RESULT:" + json.dumps(run_cc_scale(spark)))
        elif mode == "focal":
            warmup(spark)
            print("RESULT:" + json.dumps(run_focal(spark)))
        elif mode == "basinscale":
            print("RESULT:" + json.dumps(run_basin_scale(spark)))
        elif mode == "relstitchscale":
            warmup(spark)
            print("RESULT:" + json.dumps(run_relayout_stitch_scaling(spark)))
        else:
            # corpus generation is one-time setup, not engine time —
            # materialize it OUTSIDE the timed region (the reference
            # reads pre-existing rasters too)
            ensure_corpus(spark)
            t0 = time.time()
            queries = run_headline(spark)
            mosaic = run_mosaic(spark)
            print(
                "RESULT:"
                + json.dumps(
                    {"queries": queries, "mosaic": mosaic, "total": time.time() - t0}
                )
            )
    finally:
        spark.stop()


def spawn(mode: str, cores: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, __file__, "--child", mode, str(cores)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[7:])
    sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:])
    raise RuntimeError(f"bench child failed (mode={mode}, cores={cores})")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(sys.argv[2], int(sys.argv[3]))
        return

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    head = spawn("headline", CPUS)
    rel = spawn("relayout", CPUS)
    primary = spawn("mosaicdefault", CPUS)
    focal = spawn("focal", CPUS)

    # 4 vs 16 cores: a true 4x while keeping JVM task threads + Python
    # kernel workers within the machine's 32 hardware threads at the
    # high end (local[32] would oversubscribe 2x and measure contention,
    # not scaling)
    lo_cores, hi_cores = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4")), int(
        os.environ.get("SPARK_GRAFT_SCALE_HI", "16")
    )
    lo = spawn("mosaic", lo_cores)
    hi = spawn("mosaic", hi_cores)
    speedup = lo["seconds"] / hi["seconds"]
    efficiency = speedup / (hi_cores / lo_cores)

    jlo = spawn("joinscale", lo_cores)
    jhi = spawn("joinscale", hi_cores)
    j_speedup = jlo["seconds"] / jhi["seconds"]
    j_eff = j_speedup / (hi_cores / lo_cores)

    dlo = spawn("dedupscale", lo_cores)
    dhi = spawn("dedupscale", hi_cores)
    d_speedup = dlo["seconds"] / dhi["seconds"]
    d_eff = d_speedup / (hi_cores / lo_cores)

    rslo = spawn("relstitchscale", lo_cores)
    rshi = spawn("relstitchscale", hi_cores)
    rs_speedup = rslo["seconds"] / rshi["seconds"]
    rs_eff = rs_speedup / (hi_cores / lo_cores)

    out = {
        "metric": "headline operator suite elapsed (mosaic pipeline + dedup + "
        "similarity + text + relational) at sf, local[%d]" % CPUS,
        "value": round(head["total"], 3),
        "unit": "sec",
        "queries": {
            **head["queries"],
            # zero-Exchange storage path, same corpus as "mosaic":
            # build pays the wide shuffle once; stitch is the
            # repeated-run cost (bucketed scan, no Exchange)
            "mosaic_pipeline_relayout_build": rel["build_seconds"],
            "mosaic_pipeline_relayout_stitch": rel["stitch_seconds"],
            # halo-exchange hillshade over the same stitched corpus
            "focal_hillshade": focal["seconds"],
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # PRIMARY mosaic number: the relayout-backed default path (the
        # repeated-run cost a production user pays; build amortized and
        # reported inside). The shuffle-every-run wall-clock is kept as
        # mosaic_direct for the host-state retime record.
        "mosaic": primary,
        "mosaic_direct": head["mosaic"],
        "mosaic_relayout": rel,
        "focal": focal,
        "dedup_clusters_scale": spawn("ccscale", CPUS),
        "basin_scale": spawn("basinscale", CPUS),
        "scaling": {
            "cores_lo": lo_cores,
            "cores_hi": hi_cores,
            "mosaic": {
                "seconds_lo": round(lo["seconds"], 3),
                "seconds_hi": round(hi["seconds"], 3),
                "tiles_per_sec_lo": lo["tiles_per_sec"],
                "tiles_per_sec_hi": hi["tiles_per_sec"],
                "speedup": round(speedup, 3),
                "efficiency": round(efficiency, 3),
            },
            "spatial_join": {
                "seconds_lo": round(jlo["seconds"], 3),
                "seconds_hi": round(jhi["seconds"], 3),
                "rows": jlo["rows"],
                "speedup": round(j_speedup, 3),
                "efficiency": round(j_eff, 3),
            },
            "dedup_minhash": {
                "seconds_lo": round(dlo["seconds"], 3),
                "seconds_hi": round(dhi["seconds"], 3),
                "speedup": round(d_speedup, 3),
                "efficiency": round(d_eff, 3),
            },
            "relayout_stitch": {
                "seconds_lo": round(rslo["seconds"], 3),
                "seconds_hi": round(rshi["seconds"], 3),
                "tiles_per_sec_lo": rslo["tiles_per_sec"],
                "tiles_per_sec_hi": rshi["tiles_per_sec"],
                "speedup": round(rs_speedup, 3),
                "efficiency": round(rs_eff, 3),
            },
            "host_memcpy_control_gbps": {
                str(lo_cores): memcpy_control(lo_cores),
                str(hi_cores): memcpy_control(hi_cores),
            },
        },
        "kernel_ceiling": kernel_bench(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
