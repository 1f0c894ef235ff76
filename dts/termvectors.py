"""Term vectors — the doc-major (doc_id, term, tf) store.

Lucene persists term vectors as a per-document sidecar precisely because
the inverted (term-major) postings make "what terms does doc D contain"
an index-wide scan: every term's posting list would need decoding just
to test membership. This engine does the same: build_index(
store_term_vectors=True) writes the tf frame's (doc_id, term, tf)
projection doc_id-range-partitioned and doc_id-sorted, so a per-doc
fetch prunes to one row-group via parquet min/max stats (reference
parity: the reference engine has no doc-major store at all — its
per-doc results are recomputed from text, src/apm1.c:252; this sidecar
is the indexed-engine upgrade MLT/highlight/explain UIs need).

Scale shape: reads are an IN-list-pushed scan of a narrow 3-column
parquet — no shuffle, no postings decode; the write is one extra
column-pruned pass over the ALREADY-cached tf frame at build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Guard for the driver-side IN-list: per-doc fetches are client-sized by
# contract (a results page, an MLT seed set); corpus-scale callers pass
# doc_ids=None and join downstream instead.
MAX_FETCH_IDS = 10_000


def term_vectors(
    spark: SparkSession,
    index_dir: str,
    doc_ids: list[int] | None = None,
    mask_deleted: bool = True,
) -> DataFrame:
    """(doc_id, term, tf) for the requested docs (all live docs when
    ``doc_ids`` is None). ``doc_ids`` is a client-sized list pushed down
    as an IN-list filter — doc_id-sorted row-groups mean only the files
    containing those docs are read. Tombstoned docs are masked exactly
    like every other match surface (anti-join against the colocated
    tombstone store) until compaction drops their rows physically."""
    from dts.delete import deletes_df, has_deletes
    from dts.index_build import load_meta

    if not load_meta(index_dir).get("store_term_vectors"):
        raise ValueError(
            "index has no term_vectors sidecar; rebuild with "
            "build_index(store_term_vectors=True)"
        )
    tv = spark.read.parquet(f"{index_dir}/term_vectors")
    if doc_ids is not None:
        ids = sorted({int(d) for d in doc_ids})
        if len(ids) > MAX_FETCH_IDS:
            raise ValueError(
                f"doc_ids is {len(ids)} > MAX_FETCH_IDS={MAX_FETCH_IDS}; "
                "per-doc fetches are client-sized — join against the "
                "term_vectors parquet directly for corpus-scale reads"
            )
        tv = tv.where(F.col("doc_id").isin(ids)) if ids else tv.limit(0)
    if mask_deleted and has_deletes(index_dir):
        # No explicit broadcast hint: tombstone sets are usually small
        # (AQE broadcasts them) but can reach corpus scale pre-compaction,
        # where a forced broadcast would be the bug.
        tv = tv.join(deletes_df(spark, index_dir), "doc_id", "left_anti")
    return tv.select("doc_id", "term", "tf")
