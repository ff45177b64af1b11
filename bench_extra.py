#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times each headline query
with the noop sink (collect-shaped queries keep their collect so the
timed region matches bench.py), captures .explain("formatted") into
plans/r07/, and breaks the mosaic pipeline into phases.

Separate from the FROZEN bench.py on purpose — this file is the
measurement notebook for OPTIMIZATION_r07.md, not the driver metric.

Usage:
  python bench_extra.py queries [--tag before] [--names a,b,c]
  python bench_extra.py phases
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS = REPO / "plans" / "r07"


def _spark():
    from moamosaic_spark.session import get_spark

    return get_spark(
        f"local[{CPUS}]",
        app_name="moamosaic-bench-extra",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


HEADLINE = [
    # (name, action) mirroring bench.run_headline exactly
    ("mosaic_pipeline", "collect", "q_mosaic_tile_checksums"),
    ("mosaic_join", "count", "q_mosaic_assignments"),
    ("dedup_minhash", "count", "q_dedup_minhash_sig"),
    ("dedup_ngram", "count", "q_dedup_ngram_pairs"),
    ("dedup_simhash", "count", "q_dedup_simhash"),
    ("dedup_lsh", "count", "q_dedup_lsh_candidates"),
    ("embedding_topk", "collect", "q_embedding_topk"),
    ("embedding_neardup", "count", "q_embedding_neardup_pairs"),
    ("doc_token_stats", "count", "q_doc_token_stats"),
    ("mosaic_resampled", "collect", "q_mosaic_resampled_checksums"),
    ("mosaic_warped", "collect", "q_mosaic_warped_checksums"),
    ("lineitem_agg", "collect", "q_lineitem_agg"),
    ("events_hourly", "count", "q_events_hourly"),
    ("orders_by_nation", "collect", "q_orders_by_nation"),
]


def run_queries(tag: str, names: set[str] | None) -> None:
    from moamosaic_spark import driver_contract as DC

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    PLANS.mkdir(parents=True, exist_ok=True)
    out = {}
    for name, action, qname in HEADLINE:
        if names and name not in names:
            continue
        fn = getattr(DC, qname)
        spark.sparkContext.setJobDescription(f"extra:{name}")
        t0 = time.time()
        df = fn(spark, SF_DIR)
        if action == "collect":
            df.collect()
        else:
            df.count()
        cold = time.time() - t0
        # warm repeat (session caches like _mosaic_result_cached persist)
        t0 = time.time()
        df2 = fn(spark, SF_DIR)
        (df2.collect() if action == "collect" else df2.count())
        warm = time.time() - t0
        out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
        plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (PLANS / f"{name}_{tag}.txt").write_text(plan)
        print(f"{name}: cold={cold:.3f} warm={warm:.3f}", flush=True)
    print("RESULT:" + json.dumps(out))
    spark.stop()


def run_phases() -> None:
    """Mosaic pipeline phase breakdown at sf (fresh session, like the
    bench's first query)."""
    from pyspark.sql import functions as F

    from moamosaic_spark import driver_contract as DC
    from moamosaic_spark.mosaic import MosaicConfig, do_mosaic, validate_projections
    from moamosaic_spark.plans.grid import make_output_grid

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    t = {}

    def phase(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        print(f"{name}: {t[name]}", flush=True)
        return r

    fp = DC.derived_footprints(spark, SF_DIR)
    blocks = DC.derived_blocks(fp)
    phase("validate_projections", lambda: validate_projections(fp))
    grid = phase("make_output_grid", lambda: make_output_grid(fp, None))
    cfg = MosaicConfig(
        blocksize=DC.BLOCKSIZE, src_blocksize=DC.SRC_BS,
        min_overview_size=DC.MIN_OV, check_projections=False,
    )
    res = phase("plan_do_mosaic", lambda: do_mosaic(spark, fp, blocks, cfg, grid=grid))
    phase("assignments_count", lambda: res.assignments.count())
    phase("stitch_noop", lambda: noop(res.tiles.select("band", "tile_row", "tile_col", "pixels")))
    phase("stitch_noop_warm", lambda: noop(res.tiles.select("band", "tile_row", "tile_col", "pixels")))
    q = DC.q_mosaic_tile_checksums(spark, SF_DIR)
    phase("checksums_collect", lambda: q.collect())
    phase("checksums_collect_warm", lambda: DC.q_mosaic_tile_checksums(spark, SF_DIR).collect())
    print("RESULT:" + json.dumps(t))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    tag = "before"
    names = None
    for a in sys.argv[2:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--names="):
            names = set(a.split("=", 1)[1].split(","))
    if mode == "queries":
        run_queries(tag, names)
    elif mode == "phases":
        run_phases()
    else:
        raise SystemExit(f"unknown mode {mode}")
