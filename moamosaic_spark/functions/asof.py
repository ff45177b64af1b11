"""Backward as-of join — for every left row, the latest right row with
right.ts <= left.ts per key (event attribution, price snapping, sensor
alignment). Spark has no built-in as-of join; this is the classic
union + last-non-null-window construction, entirely built-in operators.

Semantics match DuckDB's ``ASOF LEFT JOIN`` (the oracle twin):
inclusive (right.ts == left.ts matches), unmatched left rows keep
nulls. Right rows must be unique per (key, ts) for deterministic
payloads — dedupe upstream (e.g. max_by a tiebreak column).

Scale shape: ONE shuffle on the key. The plain form sorts each key's
full history inside one window partition — fine until a single key's
history outgrows a task. ``bucket_seconds`` switches to the two-pass
time-bucketed form: windows run per (key, time-bucket), and each
bucket is seeded with the last right row of all EARLIER buckets
(computed on the tiny per-(key, bucket) tail relation) — no per-key
serialization, hot keys split across reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE, _RTS = "_asof_side", "_asof_rts"


def _prep(left: DataFrame, right: DataFrame, on: list[str], ts: str,
          right_values: list[str], suffix: str):
    rv = {v: f"{v}{suffix}" for v in right_values}
    l2 = left.withColumn(_SIDE, F.lit(1))
    r2 = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias(_SIDE),
        F.col(ts).alias(_RTS),
        *[F.col(v).alias(out) for v, out in rv.items()],
    )
    return l2, r2, rv


def _apply_window(u: DataFrame, part_cols: list, ts: str, rv: dict) -> DataFrame:
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for out in list(rv.values()) + [_RTS]:
        u = u.withColumn(out, F.last(out, ignorenulls=True).over(w))
    return u


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_values: list[str],
    suffix: str = "_r",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Left rows + the matched right payload columns (``right_values``
    renamed with ``suffix``) + ``ts + suffix`` = the matched right
    timestamp (null when no right row precedes)."""
    if bucket_seconds is not None:
        return _asof_bucketed(left, right, on, ts, right_values, suffix,
                              float(bucket_seconds))
    l2, r2, rv = _prep(left, right, on, ts, right_values, suffix)
    u = l2.unionByName(r2, allowMissingColumns=True)
    u = _apply_window(u, on, ts, rv)
    return (
        u.where(F.col(_SIDE) == 1)
        .withColumn(f"{ts}{suffix}", F.col(_RTS))
        .drop(_SIDE, _RTS)
    )


def _asof_bucketed(
    left: DataFrame, right: DataFrame, on: list[str], ts: str,
    right_values: list[str], suffix: str, bucket_seconds: float,
) -> DataFrame:
    """Two-pass bucketed form: identical output, bounded partitions."""
    b = lambda c: F.floor(F.col(c).cast("double") / bucket_seconds)  # noqa: E731
    l2, r2, rv = _prep(left, right, on, ts, right_values, suffix)
    l2 = l2.withColumn("_bk", b(ts))
    r2 = r2.withColumn("_bk", b(ts))

    # per-(key, bucket) LAST right row — tiny tail relation
    tail = r2.groupBy(*on, "_bk").agg(
        F.max_by(F.struct(_RTS, *rv.values()), F.col(_RTS)).alias("_t")
    )
    # every bucket that holds a LEFT row needs the latest right row of
    # all EARLIER buckets as its seed (including buckets with no right
    # rows at all) — computed over buckets-per-key, not over rows
    all_b = (
        l2.select(*on, "_bk").distinct()
        .unionByName(tail.select(*on, "_bk"))
        .distinct()
    )
    carried = (
        all_b.join(
            tail.select(*on, F.col("_bk").alias("_tbk"), "_t"),
            on=on, how="left",
        )
        .where(F.col("_tbk").isNull() | (F.col("_tbk") < F.col("_bk")))
        .groupBy(*on, "_bk")
        .agg(F.max_by("_t", F.col("_tbk")).alias("_seed"))
    )
    seed_rows = carried.where(F.col("_seed").isNotNull()).select(
        *on,
        "_bk",
        F.lit(0).alias(_SIDE),
        F.col(f"_seed.{_RTS}").alias(_RTS),
        *[F.col(f"_seed.{out}").alias(out) for out in rv.values()],
        # the seed's real (earlier-bucket) ts sorts it before every row
        # of this bucket
        F.col(f"_seed.{_RTS}").alias(ts),
    )
    u = l2.unionByName(r2, allowMissingColumns=True).unionByName(
        seed_rows, allowMissingColumns=True
    )
    u = _apply_window(u, [*on, "_bk"], ts, rv)
    return (
        u.where(F.col(_SIDE) == 1)
        .withColumn(f"{ts}{suffix}", F.col(_RTS))
        .drop(_SIDE, _RTS, "_bk")
    )
