"""Interleaved-document source (S1): the documents table IS the file list.

The reference reads a newline-separated list of raster paths
(mosaic.py:420-426); here, media references live as spans inside an
Iceberg/parquet table of interleaved text+media documents
(doc_id, spans: array<struct<kind, text, media_ref, offset>>).

``media_refs_in_order`` extracts media spans with ``posexplode`` and
assigns each distinct media_ref the merge priority implied by document
order — the analog of filelist order, which drives the last-non-null
merge (mosaic.py:663-689).

Per-row invariant: documents are only ever *exploded*, never mutated —
``span_sequence_fingerprint`` provides the (kind, text, media_ref,
order) fingerprint used by tests to prove span-sequence equality across
the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dense_global_rank(
    df: DataFrame, order_col: str, out_col: str = "priority"
) -> DataFrame:
    """Dense 0-based global rank by ``order_col`` WITHOUT a single-task
    global window (``Window.orderBy`` with no partitionBy funnels every
    row through ONE reducer — a serialization point at 10^9 rows).

    zipWithIndex-style two-job scheme, all DataFrame-native:
      1. range-partition by the order column (global order across
         partitions, distributed) and FREEZE the partitioning with an
         eager localCheckpoint — Spark's range partitioner samples with
         an RDD-id-dependent seed, so two separate jobs over the same
         lazy plan can pick DIFFERENT boundaries once the sample no
         longer covers every row; the counts and the ranks must see the
         same partitioning or priorities duplicate/gap at scale;
      2. tiny count job over the frozen partitions (#rows =
         #partitions) collected to the driver -> cumulative offsets;
      3. per-partition ``row_number`` (window partitioned by partition
         id — no single-task stage) + broadcast offset join.

    ``order_col`` must be a total order (unique), otherwise ranks at
    partition boundaries are ambiguous. The checkpoint stores the slim
    (order_col + carried columns) rows in executor storage for the
    duration of the returned DataFrame — the same trade
    ``RDD.zipWithIndex`` makes implicitly via its two jobs.
    """
    spark = df.sparkSession
    d = (
        df.repartitionByRange(F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["n"]) for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = spark.createDataFrame(offsets or [], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        d.withColumn("_lrk", F.row_number().over(w))
        .join(F.broadcast(off_df), on="_pid", how="inner")
        .select(
            *[c for c in df.columns if c != order_col],
            (F.col("_lrk") - 1 + F.col("_off")).cast("int").alias(out_col),
        )
    )


def media_first_seen(docs: DataFrame) -> DataFrame:
    """Distinct media refs with their first appearance key
    (media_ref, first_seen) — the un-ranked form, for callers that
    filter refs (e.g. the incremental anti-join against already-seen
    state) BEFORE paying the distributed rank."""
    spans = (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", "pos", F.col("span.media_ref").alias("media_ref"))
    )
    return spans.groupBy("media_ref").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_seen")
    )


def media_refs_in_order(docs: DataFrame) -> DataFrame:
    """Distinct media refs with priority = order of first appearance by
    (doc_id, span position). Returns (media_ref, priority).

    Shuffles touch the *media spans only* — text payload is pruned
    before the shuffle by Catalyst column pruning. Priority assignment
    is the distributed dense rank (no unpartitioned window: this is the
    priority front door of the whole engine and must not serialize).
    """
    return dense_global_rank(media_first_seen(docs), "first_seen", "priority")


def footprints_from_docs(docs: DataFrame, footprint_meta: DataFrame) -> DataFrame:
    """Build the footprints dim table for a mosaic run: media refs in
    document order joined to raster metadata; priority reassigned from
    document order (overriding whatever order the metadata table had).
    """
    refs = media_refs_in_order(docs)
    return refs.join(footprint_meta.drop("priority"), on="media_ref", how="inner")


def span_sequence_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) where fingerprint hashes the exact span
    sequence (kind, text, media_ref, order). Any per-row mutation or
    reordering anywhere in the pipeline changes the fingerprint."""
    return docs.select(
        "doc_id",
        F.sha2(
            F.to_json(
                F.transform(
                    "spans",
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                    ),
                )
            ),
            256,
        ).alias("fingerprint"),
    )
