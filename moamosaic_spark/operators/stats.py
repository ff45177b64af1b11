"""A3 stats finalization — partial+final aggregation of the per-tile
accumulators emitted by the stitch kernel.

Same algebra as the reference StatsAccumulator (mosaic.py:746-794):
mean = sum/count, variance = ssq/count - mean^2 clamped at 0 (the
negative-rounding guard at mosaic.py:791), stddev = sqrt(variance).
Spark's hash-aggregate partial+final is the distributed form of the
reference's incremental single-pass accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def finalize_stats(stitch_out: DataFrame) -> DataFrame:
    """Per-band stats from level-0 stitch rows.

    Bands with zero non-null pixels get null min/max/mean/stddev and
    count 0 (reference skips writing metadata when count==0,
    mosaic.py:389).
    """
    agg = (
        stitch_out.where(F.col("level") == 0)
        .groupBy("band")
        .agg(
            F.sum("px_count").alias("count"),
            F.sum("px_sum").alias("s"),
            F.sum("px_ssq").alias("ssq"),
            F.min("px_min").alias("minval"),
            F.max("px_max").alias("maxval"),
        )
    )
    mean = F.col("s") / F.col("count")
    variance = F.col("ssq") / F.col("count") - mean * mean
    stddev = F.when(variance >= 0, F.sqrt(variance)).otherwise(F.lit(0.0))
    has = F.col("count") > 0
    return agg.select(
        "band",
        F.when(has, F.col("minval")).alias("minval"),
        F.when(has, F.col("maxval")).alias("maxval"),
        F.when(has, mean).alias("meanval"),
        F.when(has, stddev).alias("stddev"),
        F.col("count").cast("long").alias("count"),
    )


def value_histogram(tiles: DataFrame, nullval: int = 0) -> DataFrame:
    """Exact per-band pixel-value histogram of a tile relation — the
    ``gdalinfo -hist`` analog the reference's stats sink stops short
    of (mosaic.py:746-794 keeps min/max/mean/stddev only).

    Plan shape: JVM explode of the (unpacked-at-boundary) pixel
    arrays feeds a partial hash aggregate — each task reduces its
    pixels to <= 65536 (band, val) partials map-side, so the ONE
    shuffle carries bin counts, never pixels. No Python anywhere."""
    from ..pixels import pixels_are_binary, unpack_u2

    px = F.col("pixels")
    if pixels_are_binary(tiles):
        px = unpack_u2(px)
    return (
        tiles.select("band", F.explode(px).alias("val"))
        .where(F.col("val") != nullval)
        .groupBy("band", "val")
        .agg(F.count("*").alias("n_px"))
    )
