"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: one JVM-side
  ``F.zip_with``/``F.aggregate`` dot product per row + top-k. No UDF,
  no collect; at 100 TB the scan is embarrassingly parallel and the
  top-k is a tree-aggregated ``orderBy().limit()``.
* LSH-bucketed ANN — random-hyperplane signs (sign of dot with
  deterministic ±1 hyperplanes derived from the portable hash family)
  give a b-bit bucket; candidates share the bucket, re-ranked exactly.
  The scale path: the query probes one bucket instead of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F



def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)


def _plane_signs(plane_idx: int, dim: int) -> list[float]:
    """±1 hyperplane entries from the portable hash of 'hp{p}:{d}' —
    deterministic, so they are computed HERE and emitted as a single
    array Literal (building them as per-dim hash expressions bloats the
    plan linearly with dim; the values are identical either way and
    still replayable in SQL from the same md5 rule)."""
    import hashlib

    return [
        1.0
        if (int(hashlib.md5(f"hp{plane_idx}:{d}".encode()).hexdigest()[:8], 16) & 1) == 1
        else -1.0
        for d in range(dim)
    ]


def hyperplane_sign(vec: Column, plane_idx: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[d] = ±1 derived from the
    portable hash of 'plane:d' — deterministic and replayable in SQL."""
    signs = F.lit(_plane_signs(plane_idx, dim))
    return (dot(vec, signs) > 0).cast("int")


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """b-bit random-hyperplane bucket id."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + F.shiftleft(hyperplane_sign(vec, p, dim), p)
    return bucket


def _unit_projection(vec: Column, plane_idx: int, dim: int) -> Column:
    """<vec, u> where u = (±1,...,±1)/sqrt(dim) is the deterministic
    unit hyperplane from the portable hash family. For unit-norm inputs
    |<a,u> - <b,u>| <= |a - b| (Cauchy-Schwarz), the property the
    shifted-grid candidate generator relies on."""
    import math

    signs = F.lit(_plane_signs(plane_idx, dim))
    return dot(vec, signs) / F.lit(math.sqrt(dim))


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_grid_dims: int = 3,
) -> DataFrame:
    """EXACT cosine near-duplicate pairs (cos >= threshold) WITHOUT a
    cartesian product: bucketed candidate generation with guaranteed
    recall + exact re-rank.

    Shifted-grid scheme: normalize vectors; cos(a,b) >= t implies
    ||a-b|| <= d_max = sqrt(2-2t). Project onto ``n_grid_dims``
    deterministic unit hyperplanes (projection distance <= vector
    distance), then bucket each projection into cells of width 2*d_max
    under 2^j shifted grids (per-dim shift 0 or d_max). Two points
    within d_max per dim cannot straddle a boundary in BOTH shifts, so
    every qualifying pair shares a full cell tuple in at least one
    grid — candidates are a strict superset of true pairs, and the
    equi-join on (grid, cell tuple) replaces the O(n^2) crossJoin.
    The exact cosine filter then restores exact semantics.

    Shuffle volume: 2^j copies of (id, j cells, vector) per side.
    Tighter thresholds prune harder (d_max shrinks -> more cells); at
    loose thresholds (t <= 0.5 on unit vectors) most of the sphere is
    "near" and any candidate generator degrades toward all-pairs —
    that is inherent to the query, not the plan.
    """
    import math

    if dim is None:
        first = embeddings.select(F.size(vec_col)).limit(1).collect()
        if not first:
            dim = 1
        else:
            dim = int(first[0][0])
    d_max = math.sqrt(max(2.0 - 2.0 * threshold, 1e-12))
    # grid geometry uses a PADDED step: the one-boundary-per-interval
    # argument needs separation STRICTLY below the step, and a pair at
    # exactly d_max with a point exactly on a cell boundary would
    # otherwise straddle both shifts (hypothesis-found edge case). The
    # pad also absorbs ulp-level rounding in the cell arithmetic.
    d_pad = d_max * (1.0 + 1e-9)
    cell_w = 2.0 * d_pad

    v = F.col(vec_col).cast("array<double>")
    base = (
        embeddings.select(F.col(id_col).alias("vec_id"), v.alias("vec"))
        .withColumn("_n", norm(F.col("vec")))
        .withColumn("u", F.transform("vec", lambda x: x / F.col("_n")))
    )
    projs = [_unit_projection(F.col("u"), p, dim) for p in range(n_grid_dims)]
    base = base.select(
        "vec_id", "vec", "_n",
        *[pr.alias(f"_p{i}") for i, pr in enumerate(projs)],
    )

    # SLIM candidate generation: the grid-replicated join and the
    # pair-dedup shuffle carry only ids + projections — never the
    # vectors (a pair matching in several of the 2^j grids would
    # otherwise shuffle its vector payload once per grid; measured 70x
    # slower at 2k vectors / loose threshold).
    proj_cols = [f"_p{d}" for d in range(n_grid_dims)]
    slim = base.select("vec_id", *proj_cols)

    # one row per shifted grid g in {0,1}^j: cell_d = floor((p_d + g_d*d_max)/cell_w)
    grids = []
    for g in range(2 ** n_grid_dims):
        cells = [
            F.floor(
                (F.col(f"_p{d}") + F.lit(d_pad * ((g >> d) & 1))) / F.lit(cell_w)
            ).cast("long").alias(f"_c{d}")
            for d in range(n_grid_dims)
        ]
        grids.append(F.struct(F.lit(g).alias("_g"), *cells))
    keyed = slim.select(
        "vec_id", *proj_cols, F.explode(F.array(*grids)).alias("_k")
    ).select("vec_id", *proj_cols, "_k.*")

    join_keys = ["_g"] + [f"_c{d}" for d in range(n_grid_dims)]
    a = keyed.select(
        *join_keys, F.col("vec_id").alias("id_a"),
        *[F.col(p).alias(f"{p}_a") for p in proj_cols],
    )
    b = keyed.select(
        *join_keys, F.col("vec_id").alias("id_b"),
        *[F.col(p).alias(f"{p}_b") for p in proj_cols],
    )
    cand = a.join(b, on=join_keys, how="inner").where(F.col("id_a") < F.col("id_b"))
    # exact-safe residual: qualifying pairs satisfy |p_a - p_b| <= d_max
    # in EVERY projected dim (projection distance <= vector distance).
    # Filter with the PADDED bound so the same ulp pad that protects the
    # cell bucketing also covers rounding in the computed projections —
    # a pair at exactly the threshold whose projection gap overshoots
    # d_max by a few ulps must survive to the exact re-rank.
    for p in proj_cols:
        cand = cand.where(
            F.abs(F.col(f"{p}_a") - F.col(f"{p}_b")) <= F.lit(d_pad)
        )
    cand = cand.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])

    # exact re-rank: attach vectors (+ precomputed norms) per pair once
    va = base.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("_va"),
        F.col("_n").alias("_na"),
    )
    vb = base.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    scored = (
        cand.join(va, on="id_a").join(vb, on="id_b")
        .select(
            "id_a", "id_b",
            (dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cos_sim"
            ),
        )
    )
    return scored.where(F.col("cos_sim") >= F.lit(float(threshold)))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only vectors whose hyperplane bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe LSH).
    Recall < 1 by design; the exactness gate is brute_force_topk."""
    dim = len(query_vec)
    v = F.col(vec_col).cast("array<double>")
    with_bucket = embeddings.select(
        F.col(id_col).alias("vec_id"), v.alias("vec"),
        lsh_bucket(v, n_planes, dim).alias("bucket"),
    )
    # driver-side: the query's bucket (pure python replay of the hash)
    import hashlib

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    qb = 0
    for p in range(n_planes):
        d = sum(
            q * (1.0 if (h32(f"hp{p}:{i}") & 1) == 1 else -1.0)
            for i, q in enumerate(query_vec)
        )
        qb |= int(d > 0) << p
    # popcount via bit_count (Spark 3.3+)
    near = with_bucket.where(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))) <= probe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        near.select("vec_id", cosine(F.col("vec"), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN top-k: a deterministic coarse quantizer (the
    n_centroids vectors whose portable-hashed ids are smallest — a
    seeded sample, so no training job) partitions the corpus into
    inverted lists; the query exactly re-ranks only the ``nprobe``
    lists whose centroids are nearest to it.

    Scale shape: one tiny driver collect (the centroid sample), one
    scan with a JVM-side argmin over broadcast centroid literals, a
    partition-pruning filter on the list id, exact cosine on ~nprobe/
    n_centroids of the corpus. At 100 TB the assignment would be
    precomputed once and stored as a partition column; recall < 1 by
    design — brute_force_topk is the exactness gate.
    """
    import math as _m

    from .portable import hash32

    v = F.col(vec_col).cast("array<double>")
    ids = embeddings.select(
        F.col(id_col).alias("vec_id"), v.alias("vec"),
        hash32(F.col(id_col).cast("string")).alias("_h"),
    )
    cents = [
        [float(x) for x in r.vec]
        for r in ids.orderBy("_h", "vec_id").limit(n_centroids).collect()
    ]
    if not cents:
        # empty corpus: no centroids to probe — return an empty top-k
        # with the contract schema instead of a degenerate isin([]).
        return ids.select(
            "vec_id", F.lit(0.0).alias("cos_sim")
        ).where(F.lit(False))

    def d2_expr(c):
        lit = F.lit(c)
        return F.aggregate(
            F.zip_with(F.col("vec"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(*[d2_expr(c) for c in cents])
    assigned = ids.select(
        "vec_id", "vec",
        (F.array_position(dists, F.array_min(dists)) - 1).alias("list_id"),
    )

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    q = [float(x) for x in query_vec]
    probe = sorted(range(len(cents)), key=lambda i: d2(q, cents[i]))[:nprobe]
    qlit = F.array(*[F.lit(x) for x in q])
    return (
        assigned.where(F.col("list_id").isin(*probe))
        .select("vec_id", cosine(F.col("vec"), qlit).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )
