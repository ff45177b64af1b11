"""Hash and math primitives that produce IDENTICAL values in Spark SQL
and ANSI/DuckDB SQL — the foundation of the driver's side-by-side
oracle checks (every dedup/minhash/simhash operator must hash the same
way in both engines).

The portable 32-bit hash is the first 8 hex chars of md5, read as an
unsigned integer:

    Spark : conv(substring(md5(s), 1, 8), 16, 10) :: long
    DuckDB: cast('0x' || substr(md5(s), 1, 8) as bigint)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash32(col: Column) -> Column:
    """Portable unsigned-32-bit hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    """DuckDB-side rendering of the same hash."""
    return f"cast('0x' || substr(md5({expr}), 1, 8) as bigint)"


def seeded_hash32(seed: int, col: Column) -> Column:
    """Family of portable hash functions indexed by integer seed —
    used as the minhash permutation family."""
    return hash32(F.concat(F.lit(f"{seed}:"), col))


def seeded_hash32_sql(seed: int, expr: str) -> str:
    return hash32_sql(f"'{seed}:' || {expr}")


def hash60(col: Column) -> Column:
    """Portable 60-bit hash (15 hex chars — stays inside signed int64)
    used for simhash bit sampling."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"cast('0x' || substr(md5({expr}), 1, 15) as bigint)"
