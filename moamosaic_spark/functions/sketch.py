"""KMV (k-minimum-values) distinct-count sketch — the deterministic
sketch of the task's custom-operator list.

A uniform hash maps each distinct value onto [0, 2^32); if the k-th
smallest distinct hash is h_k, the distinct count is ≈ (k-1) * 2^32 /
h_k (Bar-Yossef et al. 2002; the KMV/bottom-k estimator). Built on the
PORTABLE hash family (functions/portable.py), so unlike HLL-style
sketches the estimate is bit-reproducible across engines — DuckDB
replays it exactly, which is what lets the driver hash-match a
"sketch" at all.

Scale shape: one distinct-aggregate on (group, hash) — map-side
combinable — then a per-group bottom-k (window row_number over hashes;
the windowed relation holds DISTINCT hashes only, already far smaller
than the data). A mergeable bounded-state aggregator would avoid even
that sort; Spark exposes no Python UDAF, so bottom-k-of-distinct is the
DataFrame-native form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .portable import hash32

_SPACE = float(2**32)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per group: (n_hashes = exact distinct count of the hashed values,
    kmv_est = the k-minimum-values estimate, rounded to 4 decimals).
    Groups with fewer than k distinct values report the exact count
    (the sketch is exact below its capacity). NULL values are excluded
    (count-DISTINCT semantics; also keeps the rank order portable —
    engines disagree on NULL ordering)."""
    h = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, hash32(F.col(value_col).cast("string")).alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    ranked = h.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_hashes"),
            F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_hk"),
        )
        .select(
            *group_cols,
            "n_hashes",
            F.round(
                F.when(
                    F.col("_hk").isNotNull(),
                    F.lit(float(k - 1)) * F.lit(_SPACE) / F.col("_hk"),
                ).otherwise(F.col("n_hashes").cast("double")),
                4,
            ).alias("kmv_est"),
        )
    )
