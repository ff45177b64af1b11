"""As-of join (functions/asof.py): the union+window construction vs a
python oracle (ties, unmatched lefts, interleaved keys), and the
time-bucketed scale form's exact equality with the plain form."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from moamosaic_spark.functions.asof import asof_join


def py_asof(left, right):
    """oracle: latest right (ts, v) with ts <= left ts per key."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for (k, ts, v) in right:
        by_key[k].append((ts, v))
    for k in by_key:
        by_key[k].sort()
    out = {}
    for (lid, k, ts) in left:
        best = None
        for (rts, v) in by_key.get(k, []):
            if rts <= ts:
                best = (rts, v)
            else:
                break
        out[lid] = best
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(31)
    left, right = [], []
    for k in range(8):
        for i in range(60):
            left.append((k * 1000 + i, k, float(rng.integers(0, 500))))
        for j in range(25):
            right.append((k, float(rng.integers(0, 500)), k * 10000 + j))
    # exact-tie case: right at the same ts as a left row must match
    left.append((99001, 3, 123.0))
    right.append((3, 123.0, 39999))
    # a key with left rows but NO right rows
    left.append((99002, 77, 10.0))
    # dedupe rights per (key, ts) like the contract requires
    seen = {}
    for (k, ts, v) in right:
        seen[(k, ts)] = max(v, seen.get((k, ts), -1))
    right = [(k, ts, v) for (k, ts), v in seen.items()]
    return left, right


def test_asof_matches_python_oracle(spark, data):
    left, right = data
    ldf = spark.createDataFrame(left, "lid long, k int, ts double")
    rdf = spark.createDataFrame(right, "k int, ts double, v long")
    got = {
        r.lid: (r.ts_r, r.v_r)
        for r in asof_join(ldf, rdf, on=["k"], ts="ts", right_values=["v"]).collect()
    }
    want = py_asof(left, right)
    assert set(got) == set(want)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None), lid
        else:
            assert got[lid] == best, (lid, got[lid], best)
    assert got[99001][1] == 39999  # inclusive: equal ts matches
    assert got[99002] == (None, None)


@pytest.mark.parametrize("bucket", [None, 20.0])
def test_asof_null_right_payload_not_torn(spark, bucket):
    """A matched right row whose payload is legitimately NULL must win
    as a whole row: the output carries (its ts, null), never an OLDER
    right row's payload next to the newer matched ts (per-column
    last(ignorenulls) would tear the row; the struct carry must not)."""
    ldf = spark.createDataFrame([(1, 0, 100.0)], "lid long, k int, ts double")
    rdf = spark.createDataFrame(
        [(0, 10.0, 7), (0, 50.0, None)], "k int, ts double, v long"
    )
    kw = {} if bucket is None else {"bucket_seconds": bucket}
    [r] = asof_join(ldf, rdf, on=["k"], ts="ts", right_values=["v"], **kw).collect()
    assert (r.ts_r, r.v_r) == (50.0, None)


def test_asof_bucketed_plan_has_no_join(spark, data):
    """The bucketed form's seeds come from a window over the bucket-level
    tail relation — the plan must contain NO join at all (the old
    buckets x tail-buckets self-join was O(B^2) per key)."""
    left, right = data
    ldf = spark.createDataFrame(left, "lid long, k int, ts double")
    rdf = spark.createDataFrame(right, "k int, ts double, v long")
    plan = asof_join(
        ldf, rdf, on=["k"], ts="ts", right_values=["v"], bucket_seconds=20.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


@pytest.mark.parametrize("bucket", [7.0, 50.0, 10000.0])
def test_asof_bucketed_equals_plain(spark, data, bucket):
    """The bucketed form (bounded window partitions + cross-bucket
    seeds) must equal the plain per-key window exactly — including
    buckets with no right rows (seed carried across empty buckets) and
    a bucket far larger than the data (degenerates to plain)."""
    left, right = data
    ldf = spark.createDataFrame(left, "lid long, k int, ts double")
    rdf = spark.createDataFrame(right, "k int, ts double, v long")
    plain = {
        r.lid: (r.ts_r, r.v_r)
        for r in asof_join(ldf, rdf, on=["k"], ts="ts", right_values=["v"]).collect()
    }
    bucketed = {
        r.lid: (r.ts_r, r.v_r)
        for r in asof_join(
            ldf, rdf, on=["k"], ts="ts", right_values=["v"], bucket_seconds=bucket
        ).collect()
    }
    assert bucketed == plain


def test_interval_join_matches_bruteforce(spark):
    """Bucketed interval join == the brute-force inequality join,
    including intervals ending exactly on bucket edges (end exclusive)
    and intervals spanning many buckets."""
    from moamosaic_spark.functions.ranges import interval_join

    rng = np.random.default_rng(41)
    pts = [(i, int(k), float(t)) for i, (k, t) in enumerate(
        zip(rng.integers(0, 5, 300), rng.uniform(0, 1000, 300)))]
    # interval starts/ends include exact bucket-edge values (bucket 50)
    ivs = []
    for j in range(60):
        k = int(rng.integers(0, 5))
        s = float(rng.choice([rng.uniform(0, 950), rng.integers(0, 19) * 50.0]))
        ln = float(rng.choice([rng.uniform(1, 40), 50.0, 200.0]))
        ivs.append((j, k, s, s + ln))
    # a point exactly at an interval END must NOT match; at START must
    pts.append((9001, 1, 500.0))
    ivs.append((9101, 1, 450.0, 500.0))   # end-exclusive: no match
    ivs.append((9102, 1, 500.0, 550.0))   # start-inclusive: match

    pdf = spark.createDataFrame(pts, "pid long, k int, t double")
    idf = spark.createDataFrame(ivs, "iid long, k int, s double, e double")
    got = {
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, on=["k"], ts="t", start="s", end="e",
                               bucket_size=50.0).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in pdf.join(idf, on="k").where(
            (F.col("s") <= F.col("t")) & (F.col("t") < F.col("e"))
        ).collect()
    }
    assert got == want
    assert (9001, 9102) in got and (9001, 9101) not in got


def test_kmv_sketch_accuracy_and_exact_below_k(spark):
    """KMV estimate within the expected relative error (~1/sqrt(k-1))
    of the true distinct count above capacity; exact below it."""
    from moamosaic_spark.functions.sketch import kmv_distinct

    rows = [("big", f"u{i % 5000}") for i in range(20000)]
    rows += [("small", f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    got = {r.grp: (r.n_hashes, r.kmv_est)
           for r in kmv_distinct(df, ["grp"], "uid", k=64).collect()}
    n, est = got["big"]
    assert n == 5000
    assert abs(est - 5000) / 5000 < 0.5  # 3-4 sigma at k=64
    assert got["small"] == (40, 40.0)    # below capacity: exact


def test_kmv_two_pass_pool_shrinks_and_stays_exact(spark):
    """At cardinality >> k the windowed relation must be the pruned
    pool (~safety*k rows), not all distinct hashes — and its bottom-k
    must still be EXACTLY the global bottom-k. A deliberately starved
    safety factor must trigger the rescue path and stay exact too."""
    from moamosaic_spark.functions.portable import hash32
    from moamosaic_spark.functions.sketch import _bottomk_pool, kmv_distinct

    n = 30000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("uid")
    )
    h = df.select("grp", hash32(F.col("uid")).alias("_h")).distinct()
    counts = h.groupBy("grp").agg(F.count("*").cast("long").alias("n_hashes"))
    pool = _bottomk_pool(h, counts, ["grp"], 64, 4.0)
    n_pool = pool.count()
    assert n_pool < n / 20, n_pool          # ~256 expected of 30000
    full64 = [r._h for r in h.orderBy("_h").limit(64).collect()]
    pool64 = [r._h for r in pool.orderBy("_h").limit(64).collect()]
    assert pool64 == full64

    want_est = 63 * 2**32 / full64[-1]
    got = kmv_distinct(df, ["grp"], "uid", k=64).collect()[0]
    assert got.n_hashes == n
    assert abs(got.kmv_est - want_est) < 1e-3

    # starved threshold -> rescue path -> identical result
    got2 = kmv_distinct(df, ["grp"], "uid", k=64, safety=0.05).collect()[0]
    assert (got2.n_hashes, got2.kmv_est) == (got.n_hashes, got.kmv_est)


def test_kmv_null_group_key_uses_estimator(spark):
    """A group whose key is NULL must flow through the two-pass pruner
    like any other (struct-key joins match null fields) — not silently
    fall back to the exact count while the DuckDB oracle estimates."""
    from moamosaic_spark.functions.portable import hash32
    from moamosaic_spark.functions.sketch import kmv_distinct

    rows = [(None, f"u{i}") for i in range(300)]
    rows += [("a", f"v{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    got = {r.grp: (r.n_hashes, r.kmv_est)
           for r in kmv_distinct(df, ["grp"], "uid", k=64).collect()}
    assert set(got) == {None, "a"}
    h = df.select("grp", hash32(F.col("uid")).alias("_h")).distinct()
    for gval in (None, "a"):
        cond = F.col("grp").isNull() if gval is None else (F.col("grp") == gval)
        hs = sorted(r._h for r in h.where(cond).collect())
        want = 63 * 2**32 / hs[63]
        n, est = got[gval]
        assert n == 300
        assert abs(est - want) < 1e-3, (gval, est, want)
