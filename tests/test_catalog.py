"""Iceberg capability seam (catalog.py): the ABSENT path — the only
one runnable in this sandbox (no Iceberg jars). The probe must report
absence, every routed operation must fall back to the parquet
behavior, and the incremental sink must produce identical results with
sink_table set (the seam is a no-op without the runtime)."""

from pyspark.sql import functions as F

from moamosaic_spark import catalog as C


def test_probe_reports_absent(spark):
    assert C.iceberg_available(spark) is False
    assert C.iceberg_catalog_names(spark) == []
    assert C.table_format(spark) == "parquet"


def test_merge_falls_back(spark):
    """No jars: merge_touched_tiles must write NOTHING and return
    False so callers keep the partition-overwrite emulation."""
    updates = spark.range(3).select(
        F.lit(0).alias("level"), F.lit(1).alias("band"),
        F.col("id").cast("int").alias("tile_row"),
        F.lit(0).alias("tile_col"), F.lit(7).alias("part"),
    )
    assert C.merge_touched_tiles(spark, updates, "moa_merge_fallback") is False
    assert not spark.catalog.tableExists("moa_merge_fallback")


def test_write_mosaic_table_parquet_fallback(spark):
    spark.sql("DROP TABLE IF EXISTS moa_sink_fallback")
    tiles = spark.range(6).select(
        F.lit(1).alias("band"),
        (F.col("id") % 3).cast("int").alias("tile_row"),
        (F.col("id") / 3).cast("int").alias("tile_col"),
        (F.col("id") * 10).alias("checksum"),
    )
    fmt = C.write_mosaic_table(spark, tiles, "moa_sink_fallback")
    assert fmt == "parquet"
    back = spark.table("moa_sink_fallback")
    assert back.count() == 6
    assert sorted(r.checksum for r in back.collect()) == [0, 10, 20, 30, 40, 50]
    spark.sql("DROP TABLE IF EXISTS moa_sink_fallback")


def test_incremental_sink_table_ignored_without_jars(spark, tmp_path):
    """process_batch with sink_table set but no Iceberg runtime must
    behave exactly as without it: parquet emulation at out_path, no
    catalog table created."""
    from moamosaic_spark.mosaic import MosaicConfig
    from moamosaic_spark.sources import synth
    from moamosaic_spark.sources.docs import footprints_from_docs
    from moamosaic_spark.streaming.incremental import process_batch

    rasters = synth.golden_pair(128, 128)
    docs, fp, blocks = synth.corpus_to_spark(spark, rasters)
    meta = footprints_from_docs(docs, fp.drop("priority"))
    cfg = MosaicConfig(blocksize=64, src_blocksize=256, min_overview_size=64,
                       sink_parts=4)
    out = str(tmp_path / "sink")
    r = process_batch(docs, 0, spark, meta, blocks, out, cfg,
                      sink_table="moa_iceberg_sink_absent")
    assert r["new_refs"] > 0 and r["tiles_written"] > 0
    tiles = spark.read.parquet(f"{out}/tiles")
    assert tiles.count() == r["tiles_written"]
    assert not spark.catalog.tableExists("moa_iceberg_sink_absent")
