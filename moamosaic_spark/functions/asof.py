"""Backward as-of join — for every left row, the latest right row with
right.ts <= left.ts per key (event attribution, price snapping, sensor
alignment). Spark has no built-in as-of join; this is the classic
union + last-non-null-window construction, entirely built-in operators.

Semantics match DuckDB's ``ASOF LEFT JOIN`` (the oracle twin):
inclusive (right.ts == left.ts matches), unmatched left rows keep
nulls. Right rows must be unique per (key, ts) for deterministic
payloads — dedupe upstream (e.g. max_by a tiebreak column). Right
payload values MAY be null: the whole right row is carried as ONE
struct (non-null for every right row), so a legitimately-null payload
column never tears the match apart across columns — all payloads and
``ts_r`` always come from the same matched right row.

Scale shape: ONE shuffle on the key. The plain form sorts each key's
full history inside one window partition — fine until a single key's
history outgrows a task. ``bucket_seconds`` switches to the two-pass
time-bucketed form: windows run per (key, time-bucket), and each
bucket is seeded with the last right row of all EARLIER buckets. The
seeds are derived with a single window over the per-(key, bucket) tail
relation (one row per bucket — O(B log B) per key, never the O(B^2)
bucket x bucket self-join) — no per-key row serialization, hot keys
split across reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE, _PAY, _RTS = "_asof_side", "_asof_pay", "_asof_rts"


def _prep(left: DataFrame, right: DataFrame, on: list[str], ts: str,
          right_values: list[str], suffix: str):
    rv = {v: f"{v}{suffix}" for v in right_values}
    l2 = left.withColumn(_SIDE, F.lit(1))
    # one struct per right row: non-null even when every payload value
    # is null, so a single last(ignorenulls) carries the matched row
    # atomically (ts + all payloads from the SAME row).
    r2 = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(ts).alias(_RTS),
            *[F.col(v).alias(out) for v, out in rv.items()],
        ).alias(_PAY),
    )
    return l2, r2, rv


def _apply_window(u: DataFrame, part_cols: list, ts: str) -> DataFrame:
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))


def _unpack(u: DataFrame, ts: str, rv: dict, suffix: str) -> DataFrame:
    out = u.where(F.col(_SIDE) == 1)
    for o in rv.values():
        out = out.withColumn(o, F.col(f"{_PAY}.{o}"))
    return (
        out.withColumn(f"{ts}{suffix}", F.col(f"{_PAY}.{_RTS}"))
        .drop(_SIDE, _PAY)
    )


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
    u = _apply_window(u, on, ts)
    return _unpack(u, ts, rv, suffix)


def _asof_bucketed(
    left: DataFrame, right: DataFrame, on: list[str], ts: str,
    right_values: list[str], suffix: str, bucket_seconds: float,
) -> DataFrame:
    """Two-pass bucketed form: identical output, bounded partitions."""
    b = lambda c: F.floor(F.col(c).cast("double") / bucket_seconds)  # noqa: E731
    l2, r2, rv = _prep(left, right, on, ts, right_values, suffix)
    l2 = l2.withColumn("_bk", b(ts))
    r2 = r2.withColumn("_bk", b(ts))

    # per-(key, bucket) LAST right row — tiny tail relation (<= one row
    # per (key, bucket)); ordered by the struct's ts field.
    tail = r2.groupBy(*on, "_bk").agg(
        F.max_by(_PAY, F.col(f"{_PAY}.{_RTS}")).alias("_t")
    )
    # every bucket that holds a LEFT row needs the latest right tail of
    # all STRICTLY EARLIER buckets as its seed (including buckets with
    # no right rows at all). Derived with one window over the bucket-
    # level relation: need-rows (one per left bucket, null _t) sort
    # BEFORE the same bucket's tail row, so a frame ending at the
    # current row sees exactly the tails of earlier buckets.
    need = (
        l2.select(*on, "_bk").distinct()
        .withColumn("_isr", F.lit(0))
    )
    combined = tail.withColumn("_isr", F.lit(1)).unionByName(
        need, allowMissingColumns=True  # fills _t with a typed null
    )
    w_seed = (
        Window.partitionBy(*on)
        .orderBy(F.col("_bk").asc(), F.col("_isr").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seed_rows = (
        combined.withColumn("_seed", F.last("_t", ignorenulls=True).over(w_seed))
        .where((F.col("_isr") == 0) & F.col("_seed").isNotNull())
        .select(
            *on,
            "_bk",
            F.lit(0).alias(_SIDE),
            F.col("_seed").alias(_PAY),
            # the seed's real (earlier-bucket) ts sorts it before every
            # row of this bucket
            F.col(f"_seed.{_RTS}").alias(ts),
        )
    )
    u = l2.unionByName(r2, allowMissingColumns=True).unionByName(
        seed_rows, allowMissingColumns=True
    )
    u = _apply_window(u, [*on, "_bk"], ts)
    return _unpack(u, ts, rv, suffix).drop("_bk")
