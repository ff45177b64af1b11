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
        # try_divide: a zero-norm vector normalizes to nulls (ANSI
        # division would error the whole query); its cell keys go null,
        # it groups with the other degenerate vectors, and the kernel's
        # NaN cosine (0/0) fails every threshold — no pairs, no crash
        .withColumn("u", F.transform("vec", lambda x: F.try_divide(x, F.col("_n"))))
    )
    projs = [_unit_projection(F.col("u"), p, dim) for p in range(n_grid_dims)]
    base = base.select(
        "vec_id", "vec", "_n",
        *[pr.alias(f"_p{i}") for i, pr in enumerate(projs)],
    )

    # IN-BUCKET exact re-rank (guide §4.2: distribution and shuffles in
    # Spark, bulk math in native code): each vector ships ONCE per
    # shifted grid — (id, vector, norm) keyed by its cell tuple — and a
    # grouped Arrow kernel scores every in-cell pair with one blocked
    # float64 GEMM, emitting ONLY pairs at/above the threshold. The
    # candidate set is never materialized as rows: the previous plan
    # (slim candidate join -> pair dedup -> two joins to re-attach
    # vectors -> interpreted per-element dot) evaluated the O(n_cell^2)
    # candidate mass through interpreted higher-order functions —
    # measured 9.7 s for 2k vectors at threshold 0.5 vs ~1 s for the
    # in-bucket GEMM, and at loose thresholds (where candidates
    # approach all-pairs) the gap grows with n^2. Shuffle volume is
    # 2^j * (id + vec + norm) per side — strictly less than before
    # (which also shuffled the candidate id-pairs). The exact-recall
    # argument is unchanged: every qualifying pair shares a full cell
    # tuple in >= 1 shifted grid, and the kernel scores ALL in-cell
    # pairs with the exact cosine.
    grids = []
    for g in range(2 ** n_grid_dims):
        cells = [
            F.floor(
                (F.col(f"_p{d}") + F.lit(d_pad * ((g >> d) & 1))) / F.lit(cell_w)
            ).cast("long").alias(f"_c{d}")
            for d in range(n_grid_dims)
        ]
        grids.append(F.struct(F.lit(g).alias("_g"), *cells))
    keyed = base.select(
        F.col("vec_id").cast("long").alias("vec_id"), "vec", "_n",
        F.explode(F.array(*grids)).alias("_k"),
    ).select("vec_id", "vec", "_n", "_k.*")

    join_keys = ["_g"] + [f"_c{d}" for d in range(n_grid_dims)]
    thr = float(threshold)

    def score_cell(key, tbl):
        import numpy as np
        import pyarrow as pa

        ids = tbl.column("vec_id").to_numpy()
        nrm = tbl.column("_n").to_numpy()
        v = tbl.column("vec").combine_chunks()
        offs = v.offsets.to_numpy()
        vals = v.values.to_numpy(zero_copy_only=False)
        n = len(ids)
        empty = pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        })
        if n < 2:
            return empty
        widths = np.diff(offs)
        if not (widths == widths[0]).all():
            raise ValueError("ragged embedding dimensions within one cell")
        mat = np.ascontiguousarray(
            vals[offs[0]: offs[-1]].reshape(n, int(widths[0])), dtype=np.float64
        )
        # sort by id so id_a < id_b is exactly the upper triangle
        order = np.argsort(ids, kind="stable")
        ids, nrm, mat = ids[order], nrm[order], mat[order]
        out_a, out_b, out_c = [], [], []
        B = 2048  # row block: bounds the (B, n) score panel
        for s in range(0, n, B):
            e = min(s + B, n)
            gpan = mat[s:e] @ mat.T
            with np.errstate(divide="ignore", invalid="ignore"):
                cpan = gpan / np.outer(nrm[s:e], nrm)
                hit = cpan >= thr  # NaN -> False, +Inf -> True (JVM-equal)
            ri, cj = np.nonzero(hit)
            keep = cj > (ri + s)  # strict upper triangle
            ri, cj = ri[keep], cj[keep]
            out_a.append(ids[ri + s])
            out_b.append(ids[cj])
            out_c.append(cpan[ri, cj])
        id_a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        id_b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        cs = np.concatenate(out_c) if out_c else np.array([], np.float64)
        return pa.table({
            "id_a": pa.array(id_a, pa.int64()),
            "id_b": pa.array(id_b, pa.int64()),
            "cos_sim": pa.array(cs, pa.float64()),
        })

    pairs = keyed.groupBy(*join_keys).applyInArrow(
        score_cell, "id_a long, id_b long, cos_sim double"
    )
    # a pair found in several shifted grids scores identically in each
    # (same float expression on the same inputs) — keep one copy
    return pairs.dropDuplicates(["id_a", "id_b"])


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
