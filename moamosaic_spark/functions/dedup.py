"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed Spark-first for 100 TB corpora:

* exact        — one hash-aggregate on the normalized fingerprint.
* n-gram Jaccard — candidate pairs ONLY via a shingle-inverted-index
  self-join (never all-pairs); intersection counts from the join,
  union by inclusion-exclusion. Shuffle is O(total shingle postings).
* MinHash+LSH  — k portable seeded hashes -> per-band signature join;
  only docs sharing a band bucket are paired (classic banding scheme;
  Broder 1997 / MMDS ch.3).
* SimHash      — 60-bit fingerprint from per-token hash bit votes
  (Charikar 2002); near-dup candidates share the fingerprint (or a
  band of it).

Every operator is pure DataFrame algebra (no UDFs) over the portable
hash family (functions/portable.py), so DuckDB can replay it
bit-identically as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .portable import hash60, seeded_hash32
from .text import fingerprint, word_shingles


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.
    Returns (fingerprint, n_docs, keep_id) — keep_id = min doc id, the
    canonical representative."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def shingle_postings(
    docs: DataFrame, id_col: str, text_col: str, k: int, distinct: bool = True
) -> DataFrame:
    """(doc_id, shingle) inverted-index postings.

    ``distinct=True`` (needed for Jaccard set algebra) costs a shuffle;
    minhash skips it — min over a multiset equals min over its set, so
    signatures aggregate with map-side combine and no dedup exchange.
    """
    p = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
    )
    return p.distinct() if distinct else p


def postings_jaccard_pairs(
    postings: DataFrame,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by Jaccard over ANY distinct
    (doc_id, shingle) postings relation — text shingles, video
    frame-hashes, audio chunk-hashes: anything set-shaped. The
    inverted-index self-join generates candidates (a pair is compared
    iff it shares >= 1 posting), intersections count join rows, unions
    come by inclusion-exclusion. Returns (doc_a, doc_b, jaccard),
    doc_a < doc_b, jaccard >= threshold. ``max_doc_freq`` caps the
    index as in ngram_jaccard_pairs."""
    p = postings
    if max_doc_freq is not None:
        hot = (
            p.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_doc_freq)
        )
        p = p.join(hot.select("shingle"), on="shingle", how="left_anti")
    sizes = p.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = p.alias("a")
    b = p.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-k-gram Jaccard similarity — the
    text instantiation of postings_jaccard_pairs.

    ``max_doc_freq`` (off by default — exact Jaccard, oracle-equal)
    caps the inverted index: a shingle appearing in more than this many
    documents (boilerplate) is dropped BEFORE the self-join, bounding
    the per-shingle pair blowup (one shingle in m docs emits m^2/2 join
    rows). With the cap on, Jaccard is computed over the capped shingle
    universe — pairs whose only overlap is boilerplate are skipped by
    design.
    """
    return postings_jaccard_pairs(
        shingle_postings(docs, id_col, text_col, k), threshold, max_doc_freq
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc_id, h0..h{n-1}) minhash signature — h_i = min over shingles
    of the seeded portable hash. One explode + one hash-aggregate with
    map-side partials; no distinct shuffle (min is set-insensitive)."""
    p = shingle_postings(docs, id_col, text_col, k, distinct=False)
    aggs = [
        F.min(seeded_hash32(i, F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    return p.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of
    num_hashes/bands rows; docs sharing any band bucket are candidate
    near-duplicates. Returns (doc_a, doc_b, n_shared_bands).

    ``signatures`` (optional) reuses a precomputed/persisted
    minhash_signatures relation — one run evaluating several dedup
    views of the same corpus should pay the shingle+hash scan once."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, id_col, text_col, k, num_hashes)
    )
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)]
        # bucket = the band's VALUE TUPLE (delimited decimal string), not
        # a Spark-internal murmur3 hash: keeps the module's portable-hash
        # contract (DuckDB replays candidate generation bit-identically)
        # and rules out hash-collision candidates not derivable from
        # band equality.
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws(",", *cols).alias("bucket"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 60) -> DataFrame:
    """60-bit SimHash fingerprint (Charikar 2002): per distinct token,
    hash to 60 bits; each bit votes +1/-1; fingerprint bit = sign of
    the vote sum. Pure explode + bit-arithmetic aggregation."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .distinct()
        .select("doc_id", hash60(F.col("tok")).alias("h"))
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select("doc_id", fp.alias("simhash"))


def exact_duplicate_edges(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate relation as EDGES (doc_a=group min, doc_b=other
    member) — the shape connected_components consumes, so exact and
    near-duplicate evidence union into one graph."""
    fps = docs.select(
        F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    keep = fps.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        fps.join(keep, on="fp")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("keep_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )


def _cc_large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u connects its LARGER neighbors to
    the min of its full neighborhood (incl. itself)."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("m"))
    # shuffled-hash on the aggregated side (guide §3.1): the star joins
    # feed a checkpoint, so SMJ's sort of both sides every alternation
    # buys nothing; the build side is one (node, min) row per distinct
    # node per partition. Measured: 104k leg 15.0 -> 12.9 s, wide
    # 904k leg 25.2 -> 22.8 s, identical labels and round counts.
    mins = mins.select("u", F.least("u", "m").alias("m")).hint("shuffle_hash")
    # no distinct here: duplicate (v, m) rows (bounded by deg(v)) are
    # collapsed by the downstream small-star's map-side-combining
    # groupBy-min and its final distinct — dropping the exchange saves
    # one shuffle per alternation in the round-latency-bound regime
    return (
        sym.join(mins, on="u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _cc_small_star(e: DataFrame) -> DataFrame:
    """Small-star round: edges oriented (larger -> smaller); every node
    connects its smaller neighbors (and itself) to its min neighbor."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    # same shuffled-hash reasoning as _cc_large_star
    mins = o.groupBy("u").agg(F.min("v").alias("m")).hint("shuffle_hash")
    out = (
        o.join(mins, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _cc_driver_side(e: DataFrame) -> DataFrame:
    """Union-find over a COLLECTED edge set (bounded by the caller's
    ``small_graph_edges`` threshold — a few MB at most): same
    (doc_id, component-min cluster_id) contract as the distributed
    loop, without its per-round checkpoint + probe latency. Small
    duplicate graphs are the common case for per-batch / per-partition
    dedup, where the distributed loop's ~10 driver rounds cost more
    than the whole graph."""
    from pyspark.sql import types as T

    rows = e.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for r in rows:
        u, v = r["u"], r["v"]
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for nd in nodes:
        rt = find(nd)
        if rt not in comp_min or nd < comp_min[rt]:
            comp_min[rt] = nd
    id_type = e.schema["u"].dataType
    schema = T.StructType([
        T.StructField("doc_id", id_type),
        T.StructField("cluster_id", id_type),
    ])
    data = [(nd, comp_min[find(nd)]) for nd in sorted(nodes)]
    return e.sparkSession.createDataFrame(data, schema)


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
    stats: dict | None = None,
    small_graph_edges: int = 65_536,
) -> DataFrame:
    """Connected components over an undirected edge relation in pure
    DataFrame algebra — the step that turns pairwise duplicate evidence
    into keep/drop CLUSTERS (A~B, B~C must collapse to one kept doc
    even when A and C share no band).

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014):
    each round is two groupBy-min + self-join passes over the edge
    set, converging in O(log^2 n) rounds (2-3 in practice for
    near-dup graphs, whose components are short chains). Every round
    is localCheckpoint'ed — iterative loops otherwise stack plans
    until analysis itself dominates. Scale shape: per-round cost is
    O(|E|) shuffle on node id; no step ever materializes a component
    membership list on one row, so a 10^9-node duplicate graph runs
    with bounded task memory.

    Returns (doc_id, cluster_id) for every node OF THE EDGE SET,
    cluster_id = min node id in its component (deterministic canonical
    representative). Isolated docs never enter the edge relation —
    callers left-join and coalesce to the doc's own id. Node ids may
    be any orderable type (long, string).

    ``stats`` (optional dict) receives {"iterations": n} — the bench
    and tests assert the O(log n) bound; the driver-side fast path
    reports 0.

    Size-adaptive (the same hot/cold split as stitch salting and
    flow_accumulation's tree routing): an edge set at or below
    ``small_graph_edges`` after dedup — a few MB collected — is solved
    driver-side with union-find in one pass instead of ~10 checkpointed
    shuffle rounds whose driver latency dwarfs the data. Larger graphs
    (including every bench CC leg) take the distributed loop unchanged.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame):
        # order-independent set signature over a checkpointed edge set:
        # one narrow scan + partial agg, no shuffle of the edges — the
        # per-round convergence PROBE. A matching signature is only a
        # candidate: the exact symmetric-difference check below confirms
        # before the loop exits, so a (astronomically unlikely) hash
        # collision costs one extra round, never a wrong answer.
        r = df.agg(
            F.count("*").alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    def _set_equal(a: DataFrame, b: DataFrame) -> bool:
        # exact: both sides distinct, so symmetric difference is empty
        # iff every (u, v) appears exactly twice in the union
        return (
            a.unionByName(b)
            .groupBy("u", "v")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") != 2)
            .isEmpty()
        )

    # TWO star alternations fused into each checkpointed round: the
    # star operators are idempotent at the fixpoint, so overshooting
    # by one alternation is harmless, and halving the checkpoint +
    # convergence-probe count halves the driver-round latency that
    # dominates when components are small relative to the cluster
    # (the dedup_clusters_scale leg is round-latency-bound).
    sig = _sig(e)
    if sig[0] <= small_graph_edges:
        if stats is not None:
            stats["iterations"] = 0
        return _cc_driver_side(e)
    n_iter = 0
    converged = False
    while n_iter < max_iterations:
        e2 = _cc_small_star(_cc_large_star(e))
        n_iter += 1
        if n_iter < max_iterations:
            e2 = _cc_small_star(_cc_large_star(e2))
            n_iter += 1
        e2 = e2.localCheckpoint(eager=True)
        sig2 = _sig(e2)
        if sig2 == sig and _set_equal(e, e2):
            e = e2
            converged = True
            break
        e, sig = e2, sig2
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    if stats is not None:
        stats["iterations"] = n_iter
    # at the fixpoint the edge set is a star forest: (node, component
    # min) for every non-root node; roots appear only on the right.
    assign = (
        e.groupBy("u")
        .agg(F.min("v").alias("cluster_id"))
        .select(F.col("u").alias("doc_id"), "cluster_id")
    )
    roots = (
        e.select(F.col("v").alias("doc_id")).distinct()
        .join(assign.select("doc_id"), on="doc_id", how="left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return assign.unionByName(roots)


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    signatures: DataFrame | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """End-to-end duplicate-cluster assignment: near-dup pairs (banded
    LSH + exact Jaccard re-rank) UNION exact-fingerprint edges ->
    connected components -> (doc_id, cluster_id, is_kept) for EVERY
    document (singletons are their own cluster). is_kept marks the
    canonical representative (min doc_id of the cluster) — the corpus
    keep/drop decision a production dedup pipeline ends with."""
    near = lsh_neardup_pairs(
        docs, id_col, text_col, k, num_hashes, bands, threshold,
        signatures=signatures,
    ).select("doc_a", "doc_b")
    edges = near.unionByName(exact_duplicate_edges(docs, id_col, text_col))
    cc = connected_components(edges, stats=stats)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(cc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_kept", F.col("doc_id") == F.col("cluster_id"))
    )


def lsh_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The complete bucketed dedup pipeline: banded-LSH candidate
    generation (minhash_lsh_candidates) + EXACT Jaccard re-rank on the
    candidates only. Returns (doc_a, doc_b, jaccard) with jaccard >=
    threshold, doc_a < doc_b. ``signatures`` as in
    minhash_lsh_candidates.

    Scale shape: pair comparisons are bounded by the banding collision
    probability, never by the inverted index's per-shingle m^2 blowup;
    the re-rank intersects via the POSTINGS relation routed through the
    candidate pairs (slim (doc_a, doc_b, shingle) rows -> count), never
    materializing or replicating a per-doc shingle array — a 50k-shingle
    doc in 200 candidate pairs costs 200 x its posting rows, not 200
    copies of a 50k-element array through the join. Recall < 1 for
    pairs whose similarity sits below the LSH S-curve at
    (num_hashes/bands rows, bands) — that is the advertised trade;
    ngram_jaccard_pairs is the exact path.
    """
    cand = minhash_lsh_candidates(
        docs, id_col, text_col, k, num_hashes, bands, signatures=signatures
    ).select("doc_a", "doc_b")
    p = shingle_postings(docs, id_col, text_col, k)
    # |A n B| per candidate pair: fan A's postings across its candidate
    # pairs, keep rows whose shingle also posts for B. Scalar rows only.
    pa = p.select(F.col("doc_id").alias("doc_a"), "shingle")
    pb = p.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(pa, on="doc_a")
        .join(pb, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    # left join keeps zero-intersection candidates (jaccard 0) so a
    # threshold of 0 still returns every LSH candidate pair.
    pairs = cand.join(inter, on=["doc_a", "doc_b"], how="left").withColumn(
        "n_common", F.coalesce(F.col("n_common"), F.lit(0))
    )
    sizes = p.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(float(threshold)))
    )
