"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship mosaic pipeline (derived 5x5 raster corpus
-> tile relation -> spatial join -> stitch kernel) at sf0.001 and
returns the per-tile checksum relation. ``queries``/``oracle_sql``
delegate to moamosaic_spark.driver_contract, where every operator from
SURVEY.md §2 has a Spark implementation and a DuckDB-replayable ANSI
SQL twin (verified side-by-side in tests/test_driver_contract.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from moamosaic_spark import driver_contract as _dc  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dc.q_mosaic_tile_checksums(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dc.queries()


def oracle_sql() -> dict[str, str]:
    return _dc.oracle_sql()
