"""Cell-keyed k-nearest-neighbour join with ring widening — the
at-scale form of the bounded-radius kNN candidate search.

The broadcast form (driver_contract.q_tile_knn_sources) is right when
the point set being searched is a dim table: broadcast it, band-filter
by |dx|,|dy| <= R, window top-k. It has two scale failures: the right
side must fit in a broadcast, and a fixed R silently returns < k
neighbours for sparse regions. This operator fixes both:

* right points are keyed by grid cell (floor(x/s), floor(y/s)) — an
  EQUI-join key, so candidate generation is a hash join (plan-asserted:
  no BroadcastNestedLoopJoin, no CartesianProduct at any size);
* each left point searches outward in cell RINGS (Chebyshev shells
  r = 0, 1, 2, ...); after ring r every unseen right point is at
  Euclidean distance >= r*s, so a left point whose current k-th
  candidate distance is < r*s is provably FINAL and exits the loop.
  Sparse regions keep widening until resolved (or the rings cover the
  data extent), so every left point gets its true top-k — never a
  silent under-fill.

Per-round state is bounded: unresolved lefts carry at most k kept
candidates each (top-k pruned after every ring), and the exploded
shell join is |unresolved| x 8r probe rows equi-joined on cell. The
driver loop runs O(max cell distance to the k-th neighbour) rounds —
2-3 when ``cell_size`` is near the typical k-NN radius; each round is
localCheckpoint'ed to keep plans flat (same pattern as
functions/dedup.connected_components).

Exactness includes ties: candidates order by (d2, *tiebreak, right
cols), and the resolution test is strict (d_k < r*s), so a boundary
point in an unsearched ring can never displace an emitted neighbour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_D2 = "_knn_d2"


def _ring_candidates(
    remaining: DataFrame,
    r2: DataFrame,
    lo: int,
    hi: int,
    left_keys: list[str],
    payload: list[str],
    k: int,
    w: Window,
    kept: DataFrame | None,
) -> DataFrame:
    """One batch's candidate relation: explode unresolved lefts to the
    Chebyshev shells ``lo..hi`` of cells (offsets generated JVM-side
    with sequence+explode — a literal array of a 100k-cell shell would
    choke Catalyst), EQUI-join right points on (cell_x, cell_y), score
    d2, union the carried top-k, prune back to top-k. Split out so
    tests can plan-assert the join is a hash join (never
    BroadcastNestedLoopJoin / CartesianProduct)."""
    probes = (
        remaining
        .withColumn("_dx", F.explode(F.sequence(F.lit(-hi), F.lit(hi))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-hi), F.lit(hi))))
        .where(F.greatest(F.abs(F.col("_dx")), F.abs(F.col("_dy"))) >= lo)
        .select(
            *left_keys, "_lx", "_ly",
            (F.col("_cx") + F.col("_dx")).alias("_cx"),
            (F.col("_cy") + F.col("_dy")).alias("_cy"),
        )
    )
    dx = F.col("_lx") - F.col("_rx")
    dy = F.col("_ly") - F.col("_ry")
    # dx*dx, not dx**2: pow() can differ from multiplication in the
    # last ulp, breaking bit-equality with oracle implementations
    new_cand = probes.join(r2, on=["_cx", "_cy"]).select(
        *left_keys,
        *payload,
        (dx * dx + dy * dy).alias(_D2),
    )
    cand = new_cand if kept is None else kept.unionByName(new_cand)
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def estimate_cell_size(
    right: DataFrame, k: int, rx: str, ry: str,
    n_probes: int = 256, n_sample: int = 4096, seed: int = 7,
) -> float:
    """Pick ``cell_size`` near the typical k-th-neighbour distance by
    MEASURING it on a bounded random subset: sample ``n_sample`` right
    points (one small collect — never the full relation), take
    ``n_probes`` of them as probes, and compute each probe's k-th-NN
    distance within the sample with numpy. Sampling thins density by
    f = n_sample/n, which inflates k-NN distances by ~1/sqrt(f) in 2-D,
    so the median is corrected by sqrt(f) before returning. The result
    only *tunes* ring count vs join fan-out — exactness never depends
    on it."""
    import numpy as np

    n = right.count()
    if n == 0:
        return 1.0
    f = min(1.0, n_sample / n)
    sample = right.select(
        F.col(rx).cast("double").alias("x"), F.col(ry).cast("double").alias("y")
    )
    if f < 1.0:
        sample = sample.sample(fraction=min(1.0, f * 1.2), seed=seed)
    pts = np.array(sample.limit(n_sample).collect(), dtype=np.float64)
    if len(pts) <= k:
        # degenerate: spread cells over the extent instead
        # (np.ptp, not ndarray.ptp — the method is gone in NumPy 2)
        span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1])) if len(pts) > 1 else 1.0
        return float(span or 1.0)
    rng = np.random.default_rng(seed)
    probes = pts[rng.choice(len(pts), size=min(n_probes, len(pts)), replace=False)]
    d2 = ((probes[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    # k-th NEIGHBOUR = (k+1)-th smallest including self (distance 0)
    kth = np.sqrt(np.partition(d2, min(k, d2.shape[1] - 1), axis=1)[:, min(k, d2.shape[1] - 1)])
    est = float(np.median(kth) * np.sqrt(max(f, 1e-12)))
    return est if est > 0 else 1.0


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_keys: list[str],
    lx: str,
    ly: str,
    rx: str,
    ry: str,
    right_cols: list[str],
    cell_size: float | None = None,
    tiebreak: list[str] | None = None,
    max_rings: int | None = None,
    probe_budget: int = 64_000_000,
    debug_stats: list | None = None,
) -> DataFrame:
    """For every left row, the ``k`` nearest right rows by squared
    Euclidean distance (ties broken by ``tiebreak`` then ``right_cols``
    order). Returns ``left_keys + [knn_rank] + right_cols + [d2]``;
    lefts with fewer than k neighbours in the whole right set get
    fewer than k output rows (exact semantics, not an error).
    ``left_keys``/``right_cols`` must not collide with the reserved
    ``_lx/_ly/_rx/_ry/_cx/_cy`` working names.

    ``cell_size`` trades join fan-out against ring count: pick it near
    the expected k-th-neighbour distance, or leave it None to have
    ``estimate_cell_size`` measure that distance on a bounded random
    subset. ``max_rings`` defaults to enough rings to cover the right
    extent (exactness preserved); cap it only when an approximate
    cutoff is acceptable.

    ``probe_budget`` bounds each batch's exploded probe relation
    (|unresolved lefts| x shell cells): ring widening narrows to fit,
    trading driver rounds for bounded shuffle volume, so a
    pathologically small ``cell_size`` degrades to more rounds — never
    to an unbounded join. ``debug_stats`` (a list) receives one dict
    per batch: lo/hi ring, unresolved count, and the probe-row bound.
    """
    tiebreak = list(tiebreak or [])
    if cell_size is None:
        cell_size = estimate_cell_size(right, k, rx, ry)
    s = float(cell_size)
    payload = list(dict.fromkeys(tiebreak + right_cols))
    order_cols = [F.col(_D2).asc()] + [F.col(c).asc() for c in payload]
    w = Window.partitionBy(*left_keys).orderBy(*order_cols)

    # coordinates cast to double so d2 is ALWAYS double — the
    # empty-input early-return emits d2 as double, and without the cast
    # integer-typed coordinates would make the normal path emit long,
    # a schema that differs between the empty and non-empty cases
    r2 = right.select(
        F.col(rx).cast("double").alias("_rx"),
        F.col(ry).cast("double").alias("_ry"),
        *payload,
        F.floor(F.col(rx) / s).cast("long").alias("_cx"),
        F.floor(F.col(ry) / s).cast("long").alias("_cy"),
    ).localCheckpoint(eager=True)

    remaining = left.select(
        *left_keys,
        F.col(lx).cast("double").alias("_lx"),
        F.col(ly).cast("double").alias("_ly"),
        F.floor(F.col(lx) / s).cast("long").alias("_cx"),
        F.floor(F.col(ly) / s).cast("long").alias("_cy"),
    )

    if max_rings is None:
        ext = r2.agg(
            F.min("_cx"), F.max("_cx"), F.min("_cy"), F.max("_cy"), F.count("*")
        ).collect()[0]
        lext = remaining.agg(
            F.min("_cx"), F.max("_cx"), F.min("_cy"), F.max("_cy")
        ).collect()[0]
        if ext[4] == 0 or lext[0] is None:  # empty right OR empty left
            out = left.select(*left_keys).limit(0)
            out = out.withColumn("knn_rank", F.lit(1).cast("int"))
            for c in right_cols:
                out = out.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
            return out.withColumn("d2", F.lit(None).cast("double"))
        # rings must cover the farthest LEFT cell -> RIGHT cell
        # Chebyshev distance — a left outside the right extent needs
        # more than the right span (caught by a probe: a left 200
        # cells east of a right cluster silently lost its 2nd
        # neighbour when the bound was span+1)
        max_rings = int(
            max(
                abs(lext[1] - ext[0]), abs(ext[1] - lext[0]),
                abs(lext[3] - ext[2]), abs(ext[3] - lext[2]),
            )
            + 1
        )
    kept: DataFrame | None = None  # top-k-so-far of unresolved lefts
    resolved: list[DataFrame] = []

    def _shell_cells(lo_: int, hi_: int) -> int:
        inner = (2 * (lo_ - 1) + 1) ** 2 if lo_ > 0 else 0
        return (2 * hi_ + 1) ** 2 - inner

    # geometric ring batches (0; 1; 2-3; 4-7; ...): O(log max_rings)
    # driver rounds even when the k-th neighbour is many cells away —
    # per-ring stepping would pay one Spark job per cell of distance.
    # probe_budget narrows a batch's shell when |remaining| x cells
    # would exceed it (at least one ring always proceeds).
    lo, hi = 0, 0
    # n_rem is known only after a round's anti-join count; the budget
    # never constrains batch 0 (one cell per left), so no extra
    # pre-loop count job unless the caller asked for the schedule
    n_rem = remaining.count() if debug_stats is not None else None
    while True:
        if debug_stats is not None:
            debug_stats.append({
                "lo": lo, "hi": hi, "n_remaining": n_rem,
                "probe_cells": _shell_cells(lo, hi),
                "probe_rows_bound": n_rem * _shell_cells(lo, hi),
            })
        cand = _ring_candidates(
            remaining, r2, lo, hi, left_keys, payload, k, w, kept
        ).localCheckpoint(eager=True)
        # FINAL iff k candidates found and the k-th strictly beats the
        # closest possible unseen point (>= hi*s away)
        bound = (hi * s) ** 2
        done_keys = (
            cand.groupBy(*left_keys)
            .agg(F.count("*").alias("_n"), F.max(_D2).alias("_dk"))
            .where((F.col("_n") == k) & (F.col("_dk") < bound))
            .select(*left_keys)
        )
        resolved.append(cand.join(done_keys, on=left_keys, how="left_semi"))
        remaining = remaining.join(done_keys, on=left_keys, how="left_anti")
        remaining = remaining.localCheckpoint(eager=True)
        n_rem = remaining.count()
        if n_rem == 0:
            kept = None
            break
        kept = cand.join(done_keys, on=left_keys, how="left_anti")
        if hi >= max_rings:
            kept = kept.localCheckpoint(eager=True)
            break
        lo = hi + 1
        target = min(max(2 * hi, 1), max_rings)
        # widest h in [lo, target] whose batch fits the probe budget:
        # n_rem * ((2h+1)^2 - (2(lo-1)+1)^2) <= probe_budget
        allowed = probe_budget // max(n_rem, 1) + (2 * (lo - 1) + 1) ** 2
        h_fit = int((allowed ** 0.5 - 1) // 2)
        hi = max(lo, min(target, h_fit))
    if kept is not None:
        # rings exhausted the extent: whatever is kept IS the full
        # top-k (possibly < k rows for lefts with a small right set)
        resolved.append(kept)

    out = resolved[0]
    for df in resolved[1:]:
        out = out.unionByName(df)
    return (
        out.withColumn("knn_rank", F.row_number().over(w).cast("int"))
        .select(*left_keys, "knn_rank", *right_cols, F.col(_D2).alias("d2"))
    )
