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

from .portable import hash32


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


def hyperplane_sign(vec: Column, plane_idx: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[d] = ±1 derived from the
    portable hash of 'plane:d' — deterministic and replayable in SQL."""
    signs = F.array(
        *[
            F.when(
                hash32(F.lit(f"hp{plane_idx}:{d}")).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
            ).otherwise(F.lit(-1.0))
            for d in range(dim)
        ]
    )
    return (dot(vec, signs) > 0).cast("int")


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """b-bit random-hyperplane bucket id."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + F.shiftleft(hyperplane_sign(vec, p, dim), p)
    return bucket


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
