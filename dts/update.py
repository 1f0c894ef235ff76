"""Document update — Lucene updateDocument / ES _update semantics.

An inverted index cannot edit a posting in place; Lucene's
updateDocument(term, doc) is DELETE-by-key + ADD-with-a-new-internal-id,
and this engine composes exactly that from its own primitives:

    upsert_docs = doc_meta key lookup → delete_docs (tombstones)
                  → merge_index (new watermark ids)

The external key lives in the stored-fields sidecar (build_index(
store_fields=[key_field])) — internal doc_ids stay what they are
everywhere else in the engine: stable, never reused identities.
Keys with no existing doc are plain inserts (the "upsert" half).

Scale shape: the key lookup is one join of the incoming batch against
the doc_id-sorted doc_meta projection (no content read); tombstoning
and merging are the existing bucket-colocated/append paths. Stats keep
counting tombstoned docs until compact_index — Lucene live-docs
semantics — so call compact when the tombstone ratio warrants, not per
update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_docs(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    key_field: str,
) -> dict:
    """Replace-or-insert ``new_docs`` (needs ``content`` + ``key_field``,
    plus every other stored field of the index) keyed by ``key_field``.
    Existing docs with a matching key are tombstoned; all incoming rows
    are then merged with fresh watermark doc_ids (arrival order).
    Returns the post-merge meta. Duplicate keys WITHIN the batch are
    rejected — last-write-wins across batches, ambiguous within one."""
    from dts.delete import delete_docs
    from dts.index_build import load_meta, merge_index

    meta = load_meta(index_dir)
    stored = meta.get("store_fields") or []
    if key_field not in stored:
        raise ValueError(
            f"key_field {key_field!r} is not a stored field of this index "
            f"(store_fields={stored}); rebuild with build_index("
            f"store_fields=[...])"
        )
    dup = (
        new_docs.groupBy(key_field)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate {key_field}={dup[0][key_field]!r} within the "
            "upsert batch; updates within one batch are ambiguous"
        )
    dm = spark.read.parquet(f"{index_dir}/doc_meta").select(
        "doc_id", key_field
    )
    old_ids = dm.join(
        new_docs.select(key_field).distinct(), key_field
    ).select("doc_id")
    # Tombstoned keys re-matched by a later upsert must not re-tombstone
    # (delete_docs validates liveness); doc_meta rows persist until
    # compaction, so anti-join the current tombstones out.
    from dts.delete import deletes_df, has_deletes

    if has_deletes(index_dir):
        old_ids = old_ids.join(
            deletes_df(spark, index_dir), "doc_id", "left_anti"
        )
    if not old_ids.isEmpty():
        delete_docs(spark, index_dir, old_ids)
    cols = [c for c in new_docs.columns if c != "doc_id"]
    return merge_index(spark, index_dir, new_docs.select(*cols))
