"""SparkSession builder with the engine's required and tuned configs.

Required: Arrow execution (the stitch kernel and all corpus builders move
pixel arrays across the Python<->JVM boundary as Arrow batches — numpy
values are rejected by the legacy row path).

Tuned for the stitch workload: tile rows are ~64KB-4MB each, so Arrow
batches are capped at a small record count to bound executor memory
(SURVEY.md §7.5), and AQE is on for skew splitting and shuffle
coalescing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession

ENGINE_CONF = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 256 rows/batch: tile rows are ~64KB-4MB, so a batch stays under
    # ~1 GB worst-case while cutting per-batch Arrow framing 4x vs the
    # old 64 (measured ~10% off the stitch wall; guide §4.2 — keep
    # batches large enough for vectorization to pay off)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # deterministic epoch math for naive timestamps across engines
    "spark.sql.session.timeZone": "UTC",
}


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executors via addPyFile (the spark-submit
    --py-files pattern, self-serve). Without it, grouped-map kernels fail
    on workers with ModuleNotFoundError whenever the repo isn't on the
    workers' PYTHONPATH (e.g. a driver harness importing by file path)."""
    if getattr(spark, "_moa_pyfiles_added", False):
        return
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / "moamosaic_spark_pkg.zip"
    src_mtime = max(p.stat().st_mtime for p in pkg_dir.rglob("*.py"))
    if not zip_path.exists() or zip_path.stat().st_mtime < src_mtime:
        tmp = zip_path.with_suffix(".tmp.zip")
        with zipfile.ZipFile(tmp, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, f"{pkg_dir.name}/{p.relative_to(pkg_dir)}")
        tmp.replace(zip_path)
    spark.sparkContext.addPyFile(str(zip_path))
    spark._moa_pyfiles_added = True


def get_spark(
    master: str | None = None,
    app_name: str = "moamosaic-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine conf applied.

    ``master=None`` leaves the master to spark-submit / the environment
    (the cluster path); tests and local tools pass ``local[N]``.
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, v in ENGINE_CONF.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
