"""Document deletion: tombstones at query time, physical at compaction.

Lucene's model, re-expressed for the doc-range-bucketed index:

1. ``delete_docs`` appends doc_ids to ``<index>/deletes/`` (parquet) and
   rewrites meta.json (which also invalidates the process-level index
   handle cache, keyed on meta mtime). Nothing else is touched — an O(1)
   metadata operation regardless of index size.
2. Query paths mask tombstoned docs BEFORE top-k truncation (inside the
   scoring kernels) or via a broadcast anti-join (row-shaped outputs:
   phrase / proximity / boolean). Corpus statistics — n_docs, avgdl, df,
   cf — deliberately KEEP counting deleted docs until a merge, exactly
   like Lucene's docFreq over live+deleted segments: scores of live docs
   shift only at compaction, never mid-tombstone.
3. ``compact_index(..., )`` (dts.index_build) physically drops deleted
   postings, recomputes exact stats (n_docs / avgdl / df / cf), rewrites
   doc_stats, clears the tombstone set, and re-encodes block maxima with
   the new avgdl — restoring both stat exactness and bmw safety.

Scale: the tombstone set is materialized driver-side as one sorted int64
array and shipped to scoring tasks inside the (already pickled) scorer
closure — the same design point as Lucene's in-memory live-docs bitset
(8 bytes per DELETED doc here, not 1 bit per doc). ``DELETED_DRIVER_CAP``
bounds the array (64 MB at the cap); past it the engine refuses and tells
the operator to compact — on a 10^12-doc index the steady state is
exactly Lucene's: a small live tombstone set between periodic merges.
The stats-delta job in compaction prunes to the buckets that actually
contain deletions (bucket = doc_id // bucket_size), so a 0.1% delete set
touches ~0.1% of postings row-groups.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dts.index_build import load_meta

DELETED_DRIVER_CAP = 8_000_000


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame | Iterable[int]
) -> dict:
    """Tombstone documents by id. Idempotent (re-deleting is a no-op in
    effect); ids outside [0, n_docs) are rejected. Returns updated meta."""
    meta = load_meta(index_dir)
    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    else:
        ids = spark.createDataFrame(
            [(int(d),) for d in set(doc_ids)], "doc_id long"
        )
    watermark = meta.get("next_doc_id", meta["n_docs"])
    bad = ids.filter(
        (F.col("doc_id") < 0) | (F.col("doc_id") >= watermark)
    ).count()
    if bad:
        raise ValueError(
            f"{bad} doc_ids outside [0, {watermark}) — refusing"
        )
    # Ids must be LIVE: already-compacted-away ids would silently skew the
    # n_docs/avgdl adjustment at the next compaction.
    dead = ids.join(
        spark.read.parquet(f"{index_dir}/doc_stats").select("doc_id"),
        "doc_id",
        "left_anti",
    ).count()
    if dead:
        raise ValueError(
            f"{dead} doc_ids are not live documents of this index — refusing"
        )
    ids.write.mode("append").parquet(f"{index_dir}/deletes")
    n_deleted = (
        spark.read.parquet(f"{index_dir}/deletes").distinct().count()
    )
    meta["n_deleted"] = int(n_deleted)
    with open(f"{index_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return meta


def deleted_ids_array(spark: SparkSession, index_dir: str, meta: dict) -> np.ndarray:
    """Sorted distinct tombstoned ids as int64 — the live-docs mask handed
    to the scoring kernels. Refuses past DELETED_DRIVER_CAP (compact)."""
    n = int(meta.get("n_deleted", 0))
    if n == 0 or not os.path.isdir(f"{index_dir}/deletes"):
        return np.zeros(0, dtype=np.int64)
    if n > DELETED_DRIVER_CAP:
        raise ValueError(
            f"{n} tombstones exceed DELETED_DRIVER_CAP={DELETED_DRIVER_CAP}; "
            "run compact_index to apply deletions physically"
        )
    rows = spark.read.parquet(f"{index_dir}/deletes").distinct().collect()
    return np.sort(np.array([r["doc_id"] for r in rows], dtype=np.int64))


def mask_deleted_rows(
    out: DataFrame, spark: SparkSession, index_dir: str, meta: dict
) -> DataFrame:
    """Broadcast anti-join for row-shaped query outputs (phrase /
    proximity / boolean): drops tombstoned doc_ids. No-op when the index
    has no tombstones."""
    if not meta.get("n_deleted"):
        return out
    dels = spark.read.parquet(f"{index_dir}/deletes").distinct()
    return out.join(F.broadcast(dels), "doc_id", "left_anti")
