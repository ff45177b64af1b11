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
combinable — then a TWO-PASS bottom-k. Pass 1 cuts each group's
distinct-hash relation at a uniformity-derived threshold
(~safety * k/n of the hash space — hashes are uniform, so ~safety*k
survivors are expected); pass 2 ranks only the survivors. A
10^9-distinct group therefore sorts ~4k rows through its window, not
10^9. Groups whose cut proved too deep (a < 2^-k-probability event at
safety=4, but possible) are detected by survivor count and re-ranked
from the full relation, so the result is always the EXACT bottom-k —
bit-identical to a full sort, which the DuckDB oracle confirms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .portable import hash32

_SPACE = float(2**32)


def _bottomk_pool(
    h: DataFrame, counts: DataFrame, group_cols: list[str], k: int,
    safety: float,
) -> DataFrame:
    """The pruned relation whose per-group window sort yields the exact
    bottom-k: all hashes <= ~safety*k/n of the hash space, plus the
    FULL relation for any group where that cut kept fewer than k
    (exactness rescue). Split out so tests can assert the row-count
    shrinkage at cardinalities >> k."""
    thr = counts.select(
        *group_cols,
        F.when(
            F.col("n_hashes") > k,
            F.least(
                F.lit(_SPACE),
                F.ceil(F.lit(_SPACE * safety * k) / F.col("n_hashes")).cast("double"),
            ),
        )
        .otherwise(F.lit(_SPACE))
        .alias("_thr"),
    )
    surv = h.join(thr, on=group_cols).where(F.col("_h") <= F.col("_thr")).drop("_thr")
    surv_counts = surv.groupBy(*group_cols).agg(F.count("*").alias("_n_surv"))
    bad = (
        counts.join(surv_counts, on=group_cols, how="left")
        .where(
            (F.coalesce(F.col("_n_surv"), F.lit(0)) < k)
            & (F.col("n_hashes") >= k)
        )
        .select(*group_cols)
    )
    good = surv.join(bad, on=group_cols, how="left_anti")
    rescue = h.join(bad, on=group_cols, how="left_semi")
    return good.unionByName(rescue)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    safety: float = 4.0,
) -> DataFrame:
    """Per group: (n_hashes = exact distinct count of the hashed values,
    kmv_est = the k-minimum-values estimate, rounded to 4 decimals).
    Groups with fewer than k distinct values report the exact count
    (the sketch is exact below its capacity). NULL values are excluded
    (count-DISTINCT semantics; also keeps the rank order portable —
    engines disagree on NULL ordering). ``safety`` scales the pass-1
    threshold; raising it trades survivor volume against rescue
    probability (the result is exact either way)."""
    # all internal joins/groupBys key on ONE struct of the group cols:
    # struct equality matches null fields, so a group whose key holds a
    # NULL is pruned/rescued/joined like any other (plain equi-joins
    # would drop its rows and silently fall back to the exact count)
    gk = "_kmv_gk"
    h = df.where(F.col(value_col).isNotNull()).select(
        F.struct(*group_cols).alias(gk),
        hash32(F.col(value_col).cast("string")).alias("_h"),
    ).distinct()
    counts = h.groupBy(gk).agg(
        F.count("*").cast("long").alias("n_hashes")
    )
    pool = _bottomk_pool(h, counts, [gk], k, float(safety))
    w = Window.partitionBy(gk).orderBy(F.col("_h").asc())
    ranked = pool.withColumn("_rk", F.row_number().over(w))
    hk = ranked.groupBy(gk).agg(
        F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_hk")
    )
    return (
        counts.join(hk, on=gk, how="left")
        .select(
            *[F.col(f"{gk}.{c}").alias(c) for c in group_cols],
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
