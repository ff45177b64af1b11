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


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-k-gram Jaccard similarity.

    Candidate generation is the shingle self-join (inverted index) —
    a doc pair is compared iff it shares >= 1 shingle, so disjoint
    documents cost nothing. Returns (doc_a, doc_b, jaccard), doc_a <
    doc_b, jaccard >= threshold.

    ``max_doc_freq`` (off by default — exact Jaccard, oracle-equal)
    caps the inverted index: a shingle appearing in more than this many
    documents (boilerplate) is dropped BEFORE the self-join, bounding
    the per-shingle pair blowup (one shingle in m docs emits m^2/2 join
    rows). With the cap on, Jaccard is computed over the capped shingle
    universe — pairs whose only overlap is boilerplate are skipped by
    design.
    """
    p = shingle_postings(docs, id_col, text_col, k)
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
