#!/usr/bin/env python
"""Capture the REAL per-round physical plans of the iterative operators
(flow_basins' doubling hops, connected_components' star rounds).

The loop bodies execute eagerly behind localCheckpoint, so the final
DataFrame's explain() only shows checkpointed-RDD scans. This tool
monkeypatches DataFrame.localCheckpoint to dump each checkpoint
candidate's plan as it is built by the LIBRARY code — no mirrored
logic, the captured plan is exactly what runs.

Usage: python tools/capture_loop_plans.py <tag>   (tag = before|after)
Writes plans/r07/{flow_basins_round,cc_round}_<tag>.txt
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Spark 4: classic sessions use the concrete subclass in sql.classic,
# which overrides localCheckpoint — patch there, not the abstract base
import pyspark.sql.classic.dataframe as DFmod
from pyspark.sql import functions as F

from moamosaic_spark.session import get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = REPO / "plans" / "r07"


def main():
    spark = get_spark("local[4]", app_name="loop-plan-capture",
                      shuffle_partitions=8,
                      extra_conf={
                          "spark.ui.enabled": "false",
                          # at capture scale (hundreds of rows) the
                          # lookup side would auto-broadcast and hide
                          # the at-scale join strategy; disable so the
                          # captured plan matches what the bench-scale
                          # state (MBs per side) actually runs
                          "spark.sql.autoBroadcastJoinThreshold": "-1",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    captured = []
    orig = DFmod.DataFrame.localCheckpoint

    def patched(self, *a, **kw):
        captured.append(self._jdf.queryExecution().explainString(mode))
        return orig(self, *a, **kw)

    DFmod.DataFrame.localCheckpoint = patched
    try:
        # ---- flow_basins round plan: 3 chains of 40 cells + sinks
        from moamosaic_spark.functions.hydro import flow_basins

        edges = spark.range(120).select(
            F.lit(1).alias("band"), F.col("id").alias("gid"),
            F.when(F.col("id") % 40 == 39, F.col("id"))
            .otherwise(F.col("id") + 1).alias("dst"))
        captured.clear()
        flow_basins(edges).count()
        # captured[0] is the initial-state checkpoint; [1] the first
        # fused-doubling round (two hop joins) — the loop's hot plan
        (OUT / f"flow_basins_round_{TAG}.txt").write_text(
            captured[1] if len(captured) > 1 else captured[-1])

        # ---- connected_components round plan: 2 chains of 30 nodes
        from moamosaic_spark.functions.dedup import connected_components

        e = spark.range(60).where(F.col("id") % 30 != 29).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        captured.clear()
        connected_components(e).count()
        # captured[0] is the deduped edge input; [1] the first fused
        # round (large/small star alternations x2)
        (OUT / f"cc_round_{TAG}.txt").write_text(
            captured[1] if len(captured) > 1 else captured[-1])
    finally:
        DFmod.DataFrame.localCheckpoint = orig
    for f in (f"flow_basins_round_{TAG}.txt", f"cc_round_{TAG}.txt"):
        print("wrote", OUT / f)
    spark.stop()


if __name__ == "__main__":
    main()
