"""Ring-widening cell-keyed kNN (functions/knn.py): exactness vs a
python brute-force oracle (ties, sparse rings, under-filled regions),
the hash-join plan guarantee, and agreement with the broadcast-radius
query form on the driver-contract fixture."""

import numpy as np
import pytest
from pyspark.sql import Window, functions as F

from moamosaic_spark.functions.knn import _ring_candidates, knn_join


def brute_knn(lpts, rpts, k):
    """oracle: per left, k nearest rights by (d2, rid)."""
    out = {}
    for lid, lx, ly in lpts:
        scored = sorted(
            ((lx - rx) * (lx - rx) + (ly - ry) * (ly - ry), rid)
            for rid, rx, ry in rpts
        )
        out[lid] = [(rank + 1, rid, d2) for rank, (d2, rid) in enumerate(scored[:k])]
    return out


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(17)
    # dense blob + a sparse far cluster (forces ring widening) + exact
    # grid points (distance ties)
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, 100, 150), rng.uniform(0, 100, 150)))]
    rpts += [(200 + i, 500.0 + 10 * i, 500.0) for i in range(4)]  # sparse
    rpts += [(300, 50.0, 60.0), (301, 60.0, 50.0), (302, 40.0, 50.0),
             (303, 50.0, 40.0)]  # equidistant from (50, 50): tie on d2
    lpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, 100, 60), rng.uniform(0, 100, 60)))]
    lpts += [(900, 50.0, 50.0),       # the tie center
             (901, 480.0, 505.0),     # sparse region -> rings widen
             (902, 300.0, 300.0)]     # empty region -> rings widen far
    ldf = spark.createDataFrame(lpts, "lid long, x double, y double")
    rdf = spark.createDataFrame(rpts, "rid long, rx double, ry double")
    return lpts, rpts, ldf, rdf


@pytest.mark.parametrize("k,cell", [(3, 10.0), (5, 25.0), (1, 7.0)])
def test_knn_join_matches_bruteforce(spark, pts, k, cell):
    lpts, rpts, ldf, rdf = pts
    got = {}
    res = knn_join(ldf, rdf, k, ["lid"], "x", "y", "rx", "ry", ["rid"],
                   cell_size=cell).collect()
    for r in res:
        got.setdefault(r.lid, []).append((r.knn_rank, r.rid, r.d2))
    want = brute_knn(lpts, rpts, k)
    assert set(got) == set(want)
    for lid in want:
        assert sorted(got[lid]) == want[lid], (lid, got[lid], want[lid])


def test_knn_underfilled_right_set(spark):
    """k larger than the whole right set: every left gets ALL rights,
    ranked — never an error, never silent truncation."""
    ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, x double, y double")
    rdf = spark.createDataFrame(
        [(10, 3.0, 0.0), (11, 1.0, 0.0)], "rid long, rx double, ry double"
    )
    rows = sorted(
        (r.knn_rank, r.rid)
        for r in knn_join(ldf, rdf, 5, ["lid"], "x", "y", "rx", "ry", ["rid"],
                          cell_size=2.0).collect()
    )
    assert rows == [(1, 11), (2, 10)]


def test_knn_left_far_outside_right_extent(spark):
    """A left point far OUTSIDE the right extent needs rings beyond the
    right span (regression: the default max_rings was right-span+1 and
    silently dropped the 2nd neighbour of a left 200 cells east)."""
    ldf = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1000.0, 0.0)], "lid long, x double, y double"
    )
    rdf = spark.createDataFrame(
        [(10, 1.0, 1.0), (11, 2.0, 2.0), (12, 900.0, 5.0), (13, 3.0, 0.0)],
        "rid long, rx double, ry double",
    )
    rows = sorted(
        (r.lid, r.knn_rank, r.rid)
        for r in knn_join(ldf, rdf, 2, ["lid"], "x", "y", "rx", "ry", ["rid"],
                          cell_size=5.0).collect()
    )
    assert rows == [(1, 1, 10), (1, 2, 11), (2, 1, 12), (2, 2, 13)], rows


def test_knn_empty_right(spark):
    ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, x double, y double")
    rdf = spark.createDataFrame([], "rid long, rx double, ry double")
    out = knn_join(ldf, rdf, 3, ["lid"], "x", "y", "rx", "ry", ["rid"],
                   cell_size=2.0)
    assert out.collect() == []
    assert out.columns == ["lid", "knn_rank", "rid", "d2"]


def test_knn_no_broadcast_needed(spark, pts):
    """The ring search must work with broadcasting disabled entirely —
    the property the broadcast-radius form lacks."""
    lpts, rpts, ldf, rdf = pts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = knn_join(ldf, rdf, 3, ["lid"], "x", "y", "rx", "ry", ["rid"],
                       cell_size=10.0).collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    got = {}
    for r in res:
        got.setdefault(r.lid, []).append((r.knn_rank, r.rid, r.d2))
    want = brute_knn(lpts, rpts, 3)
    for lid in want:
        assert sorted(got[lid]) == want[lid]


def test_ring_candidate_plan_is_hash_join(spark, pts):
    """Candidate generation is an equi-join on (cell_x, cell_y): with
    broadcasting forced off, the plan must be a shuffled hash / sort-
    merge join — never BroadcastNestedLoopJoin or CartesianProduct."""
    _, _, ldf, rdf = pts
    s = 10.0
    r2 = rdf.select(
        F.col("rx").alias("_rx"), F.col("ry").alias("_ry"), "rid",
        F.floor(F.col("rx") / s).cast("long").alias("_cx"),
        F.floor(F.col("ry") / s).cast("long").alias("_cy"),
    )
    remaining = ldf.select(
        "lid", F.col("x").alias("_lx"), F.col("y").alias("_ly"),
        F.floor(F.col("x") / s).cast("long").alias("_cx"),
        F.floor(F.col("y") / s).cast("long").alias("_cy"),
    )
    w = Window.partitionBy("lid").orderBy(F.col("_knn_d2").asc(), F.col("rid").asc())
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = _ring_candidates(remaining, r2, 1, 2, ["lid"], ["rid"], 3, w, None)
        plan = cand._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan  # it IS a join, and an equi one


def test_knn_join_agrees_with_broadcast_radius_query(spark):
    """On the driver-contract fixture the ring-widening engine form
    must reproduce q_tile_knn_sources exactly (same neighbours, same
    deterministic tie-breaks) — the broadcast query is the dim-table
    special case of the same semantics."""
    from moamosaic_spark import driver_contract as DC

    sf_dir = "/root/testdata/sf0.001"
    res = DC._mosaic_result_cached(sf_dir, spark)
    from moamosaic_spark.plans.grid import make_tile_relation

    g = res.grid
    tiles = make_tile_relation(spark, g, DC.BLOCKSIZE).select(
        "tile_row", "tile_col",
        (F.lit(g.x_min) + (F.col("left") + F.col("xsize") / 2.0) * F.lit(g.x_res)).alias("tx"),
        (F.lit(g.y_max) - (F.col("top") + F.col("ysize") / 2.0) * F.lit(g.y_res)).alias("ty"),
    )
    fp = DC.derived_footprints(spark, sf_dir).select(
        "media_ref", "priority",
        (F.col("x0") + DC.R_SIZE * DC.RES / 2.0).alias("cx"),
        (F.col("y0") - DC.R_SIZE * DC.RES / 2.0).alias("cy"),
    )
    ring = knn_join(
        tiles, fp, DC.KNN_K, ["tile_row", "tile_col"], "tx", "ty", "cx", "cy",
        ["media_ref"], cell_size=DC.KNN_R, tiebreak=["priority"],
    ).select(
        "tile_row", "tile_col", F.col("knn_rank").alias("k"), "media_ref",
        F.round("d2", 4).alias("d2"),
    )
    want = sorted(tuple(r) for r in DC.q_tile_knn_sources(spark, sf_dir).collect())
    got = sorted(tuple(r) for r in ring.collect())
    assert got == want


def test_knn_empty_left(spark):
    """An empty left side (e.g. a batch that touched no tiles) returns
    an empty result, not a TypeError from the extent aggregate."""
    ldf = spark.createDataFrame([], "lid long, x double, y double")
    rdf = spark.createDataFrame([(1, 0.0, 0.0)], "rid long, rx double, ry double")
    out = knn_join(ldf, rdf, 3, ["lid"], "x", "y", "rx", "ry", ["rid"],
                   cell_size=2.0)
    assert out.collect() == []
    assert out.columns == ["lid", "knn_rank", "rid", "d2"]


def test_knn_d2_double_for_integer_coords(spark):
    """Integer-typed coordinate columns must still emit d2 as double —
    the empty-input early-return always casts d2 to double, so the
    normal path has to match or the output schema flips with the data."""
    ldf = spark.createDataFrame([(1, 0, 0), (2, 5, 5)], "lid long, x int, y int")
    rdf = spark.createDataFrame([(10, 1, 1), (11, 3, 4)], "rid long, rx int, ry int")
    out = knn_join(ldf, rdf, 1, ["lid"], "x", "y", "rx", "ry", ["rid"],
                   cell_size=2.0)
    assert dict(out.dtypes)["d2"] == "double"
    rows = {r.lid: (r.rid, r.d2) for r in out.collect()}
    assert rows == {1: (10, 2.0), 2: (11, 5.0)}
    # and the empty-right path agrees
    empty = knn_join(ldf, spark.createDataFrame([], "rid long, rx int, ry int"),
                     1, ["lid"], "x", "y", "rx", "ry", ["rid"], cell_size=2.0)
    assert dict(empty.dtypes)["d2"] == "double"


def test_knn_auto_cell_size(spark, pts):
    """cell_size=None estimates from a sampled k-th-NN distance and
    must stay exact (the estimate only tunes ring count)."""
    lpts, rpts, ldf, rdf = pts
    res = knn_join(ldf, rdf, 3, ["lid"], "x", "y", "rx", "ry", ["rid"],
                   cell_size=None).collect()
    got = {}
    for r in res:
        got.setdefault(r.lid, []).append((r.knn_rank, r.rid, r.d2))
    want = brute_knn(lpts, rpts, 3)
    assert set(got) == set(want)
    for lid in want:
        assert sorted(got[lid]) == want[lid]


@pytest.mark.parametrize("cell", [0.1, 1000.0])  # ~100x too small / too large
def test_knn_pathological_cell_size_bounded_probes(spark, pts, cell):
    """A wildly wrong cell_size must degrade to MORE ROUNDS, never to
    an unbounded probe join: every batch's |remaining| x shell-cells
    bound stays within probe_budget (except the irreducible single-ring
    floor), and exactness is retained."""
    lpts, rpts, ldf, rdf = pts
    stats = []
    budget = 200_000
    res = knn_join(ldf, rdf, 3, ["lid"], "x", "y", "rx", "ry", ["rid"],
                   cell_size=cell, probe_budget=budget,
                   debug_stats=stats).collect()
    got = {}
    for r in res:
        got.setdefault(r.lid, []).append((r.knn_rank, r.rid, r.d2))
    want = brute_knn(lpts, rpts, 3)
    assert set(got) == set(want)
    for lid in want:
        assert sorted(got[lid]) == want[lid]
    assert len(stats) >= 1
    for s in stats[1:]:  # batch 0 is the irreducible 1-cell probe
        floor = s["n_remaining"] * (8 * s["lo"] if s["lo"] else 1)
        assert s["probe_rows_bound"] <= max(budget, floor), s
