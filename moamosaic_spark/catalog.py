"""Iceberg capability probe + table-format seam.

SURVEY §1 frames the corpus as an Iceberg table; this sandbox has no
Iceberg jars, so the engine ships a parquet emulation (bucketed Spark
tables + a row-level MERGE emulation over partitioned parquet —
sources/relayout.py, streaming/incremental.py). This module is the
seam between the two worlds:

* ``iceberg_available(spark)`` probes the JVM classpath for the
  Iceberg Spark runtime — a capability check, not a config flag, so
  the same code deploys against both environments unchanged;
* ``merge_touched_tiles`` issues a real ``MERGE INTO`` when the
  runtime is present (returns True), and returns False otherwise so
  the caller keeps today's partition-overwrite emulation;
* ``write_mosaic_table`` routes a mosaic result into an Iceberg table
  (``writeTo``) when present, else a plain parquet ``saveAsTable``.

The RELAYOUT table deliberately stays on Spark-native bucketed parquet
even when Iceberg is present: its zero-Exchange stitch contract rides
Spark's bucketed-scan ClusteredDistribution, which Iceberg's bucket
partition transform does not report to the grouped-map operator —
routing it through Iceberg would silently re-introduce the wide
shuffle the layout exists to remove.

Only the probe and the absent-path fallbacks are testable in this
sandbox (no jars); the present-path code follows the public Iceberg
Spark DDL/DML documented surface (writeTo / MERGE INTO) and activates
purely on the classpath probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASSES = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath.
    Classpath probe (Class.forName), not a config check: jars decide
    whether ``USING iceberg`` / ``MERGE INTO`` can execute at all."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASSES[0])
        return True
    except Exception:
        return False


def iceberg_catalog_names(spark: SparkSession) -> list[str]:
    """Names of session catalogs configured with an Iceberg
    implementation (``spark.sql.catalog.<name>`` conf entries). Empty
    when the jars are absent or nothing is configured."""
    if not iceberg_available(spark):
        return []
    out = []
    for k, v in spark.sparkContext.getConf().getAll():
        parts = k.split(".")
        if (
            len(parts) == 4
            and k.startswith("spark.sql.catalog.")
            and v in ICEBERG_CATALOG_CLASSES
        ):
            out.append(parts[3])
    return sorted(out)


def table_format(spark: SparkSession) -> str:
    """'iceberg' when the runtime is present, else 'parquet' — the
    format new managed tables are created with."""
    return "iceberg" if iceberg_available(spark) else "parquet"


def merge_touched_tiles(
    spark: SparkSession,
    updates: DataFrame,
    table: str,
    key_cols: tuple[str, ...] = ("level", "band", "tile_row", "tile_col"),
) -> bool:
    """Row-level upsert of re-stitched tiles. With Iceberg present:
    a real ``MERGE INTO`` on the tile key (update matched, insert new)
    — the operation streaming/incremental.py emulates with partition
    rewrites — and returns True. Without it: returns False and writes
    NOTHING; the caller must run the parquet emulation."""
    if not iceberg_available(spark):
        return False
    updates = updates.drop("part")
    if not spark.catalog.tableExists(table):
        updates.writeTo(table).using("iceberg").create()
        return True
    updates.createOrReplaceTempView("_moa_tile_updates")
    try:
        on = " AND ".join(f"t.{c} = u.{c}" for c in key_cols)
        spark.sql(
            f"MERGE INTO {table} t USING _moa_tile_updates u ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    finally:
        # never leak the view into the shared session catalog — a
        # concurrent pipeline's later MERGE would silently read this
        # batch's updates
        spark.catalog.dropTempView("_moa_tile_updates")
    return True


def write_mosaic_table(
    spark: SparkSession, tiles: DataFrame, table: str
) -> str:
    """Full-snapshot mosaic sink into a catalog TABLE (the path-based
    sink is mosaic.write_mosaic). Iceberg present: ``writeTo`` with
    the deterministic tile order preserved per file. Absent: plain
    parquet ``saveAsTable`` — same layout, no snapshot/time-travel.
    Returns the format used."""
    ordered = tiles.repartitionByRange(
        "band", "tile_row", "tile_col"
    ).sortWithinPartitions("band", "tile_row", "tile_col")
    if iceberg_available(spark):
        ordered.writeTo(table).using("iceberg").createOrReplace()
        return "iceberg"
    ordered.write.mode("overwrite").format("parquet").saveAsTable(table)
    return "parquet"
