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


def media_refs_in_order(docs: DataFrame) -> DataFrame:
    """Distinct media refs with priority = order of first appearance by
    (doc_id, span position). Returns (media_ref, priority).

    One shuffle (the window sort) over the *media spans only* — text
    payload is pruned before the shuffle by Catalyst column pruning.
    """
    spans = (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", "pos", F.col("span.media_ref").alias("media_ref"))
    )
    firsts = spans.groupBy("media_ref").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_seen")
    )
    w = Window.orderBy("first_seen")
    return firsts.select(
        "media_ref", (F.row_number().over(w) - 1).cast("int").alias("priority")
    )


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
