"""Facet counts — per-query aggregation of matches over a metadata field.

The search-engine staple next to the results list ("lang: py (812),
rust (77), …"). Composes with ANY doc-granular query output of this
engine — boolean matches, phrase/proximity hits, BM25 top-k — since they
all carry doc_id. The join is matches ⋈ docs on doc_id with the doc side
pruned to (doc_id, field): at cluster scale the matches side is hit-sized
and broadcastable for top-k/boolean outputs, and the aggregation is a
standard partial+final hash agg (map-side combined, no skew beyond the
facet-value distribution itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Auto mode broadcasts the match side only when a bounded count proves it
# hit-sized; above this many rows the join falls back to a shuffle.
BROADCAST_HITS_CAP = 1_000_000


def facet_counts(
    matches: DataFrame,
    docs: DataFrame,
    field: str,
    key: str,
    broadcast_matches: bool | None = None,
    pushdown_hits: bool = False,
) -> DataFrame:
    """(key, field, n): how many matched docs of each ``key`` (query id
    column of ``matches``) carry each value of ``docs.field``.

    ``broadcast_matches``: hit lists from top-k / boolean / phrase
    outputs are query-sized — broadcasting them turns the join into a
    map-side lookup over the (doc_id, field) projection. Set False for
    corpus-scale match sets (falls back to a shuffle join). ``None``
    (default — round-5 verdict #8, safe-by-default): top-k-shaped
    frames (a ``rank`` column) broadcast outright; anything else pays
    one bounded ``limit(cap+1).count()`` probe and broadcasts only when
    provably under BROADCAST_HITS_CAP — a head-term boolean query's
    corpus-scale hit set now takes the shuffle join without the caller
    having to know.

    ``pushdown_hits``: for CLIENT-sized hit lists (top-k pages), collect
    the distinct doc_ids and filter the docs scan with an IN-list — the
    filter reaches the parquet row-group stats (doc_ids are
    write-ordered), so the (doc_id, field) projection reads only the
    row-groups containing hits instead of the whole corpus. Leave False
    for corpus-scale match sets (boolean/phrase over common terms), where
    collecting would be a driver blowup and the scan is unavoidable.
    """
    m = matches.select(key, "doc_id").distinct()
    side = docs.select("doc_id", field)
    if pushdown_hits:
        ids = sorted({int(r["doc_id"]) for r in m.select("doc_id").distinct().collect()})
        side = side.where(F.col("doc_id").isin(ids)) if ids else side.limit(0)
    if broadcast_matches is None:
        broadcast_matches = (
            "rank" in matches.columns
            or m.limit(BROADCAST_HITS_CAP + 1).count() <= BROADCAST_HITS_CAP
        )
    if broadcast_matches:
        m = F.broadcast(m)
    return (
        side.join(m, "doc_id")
        .groupBy(key, field)
        .agg(F.count("*").alias("n"))
    )


def facet_counts_indexed(
    spark: SparkSession,
    index_dir: str,
    matches: DataFrame,
    field: str,
    key: str,
    broadcast_matches: bool | None = None,
    pushdown_hits: bool = False,
) -> DataFrame:
    """facet_counts over the index's OWN ``doc_meta`` sidecar
    (build_index(store_fields=[...]) — Lucene stored-fields analogue):
    the doc side is the (doc_id, metadata) projection persisted at build
    time, doc_id-sorted for hit-list IN-list pushdown, so faceting never
    joins back to the source table — at cluster scale the source may be
    remote, re-partitioned since indexing, or retired; the index answers
    alone. The sidecar tracks merges (appended rows) and
    deletion-applying compaction (tombstoned rows dropped); pre-compaction
    tombstones never surface because every match-producing surface of
    the engine is already delete-masked."""
    from dts.index_build import load_meta

    fields = load_meta(index_dir).get("store_fields") or []
    if field not in fields:
        raise ValueError(
            f"field {field!r} not stored in this index (store_fields="
            f"{fields}); rebuild with build_index(store_fields=[...])"
        )
    side = spark.read.parquet(f"{index_dir}/doc_meta")
    return facet_counts(
        matches, side, field, key,
        broadcast_matches=broadcast_matches, pushdown_hits=pushdown_hits,
    )


def facet_histogram(
    matches: DataFrame | None,
    docs: DataFrame,
    field: str,
    interval: float,
    key: str | None = None,
    offset: float = 0.0,
    broadcast_matches: bool | None = None,
    pushdown_hits: bool = False,
) -> DataFrame:
    """ES histogram aggregation: bucket a numeric field into fixed
    ``interval`` steps — bucket_lo = floor((v − offset)/interval)·interval
    + offset — and count docs per bucket. With ``matches`` (+ ``key``),
    counts are per query over the matched docs (the facet_counts join,
    same broadcast/pushdown policy); with ``matches=None`` it is the
    corpus-wide histogram, one scan + hash agg. Null values drop (ES
    skips missing unless told otherwise). 100% JVM expressions."""
    if interval <= 0:
        raise ValueError("interval must be > 0")
    bucket = (
        F.floor((F.col(field).cast("double") - F.lit(float(offset)))
                / F.lit(float(interval)))
        * F.lit(float(interval))
        + F.lit(float(offset))
    ).alias("bucket_lo")
    side = (
        docs.select("doc_id", F.col(field))
        .filter(F.col(field).isNotNull())
        .select("doc_id", bucket)
    )
    if matches is None:
        return side.groupBy("bucket_lo").agg(F.count("*").alias("n"))
    if key is None:
        raise ValueError("key is required when matches is given")
    return facet_counts(
        matches, side, "bucket_lo", key,
        broadcast_matches=broadcast_matches, pushdown_hits=pushdown_hits,
    )


def facet_histogram_indexed(
    spark: SparkSession,
    index_dir: str,
    field: str,
    interval: float,
    matches: DataFrame | None = None,
    key: str | None = None,
    offset: float = 0.0,
    broadcast_matches: bool | None = None,
    pushdown_hits: bool = False,
) -> DataFrame:
    """facet_histogram over the index's own doc_meta sidecar (the
    stored-fields projection — no query-time join to the source table)."""
    from dts.index_build import load_meta

    fields = load_meta(index_dir).get("store_fields") or []
    if field not in fields:
        raise ValueError(
            f"field {field!r} not stored in this index (store_fields="
            f"{fields}); rebuild with build_index(store_fields=[...])"
        )
    side = spark.read.parquet(f"{index_dir}/doc_meta")
    return facet_histogram(
        matches, side, field, interval, key=key, offset=offset,
        broadcast_matches=broadcast_matches, pushdown_hits=pushdown_hits,
    )
