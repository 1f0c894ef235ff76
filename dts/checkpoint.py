"""Resumable index builds: per-partition checkpoints, lineage, metrics (O23).

The reference never needed this (jobs are seconds, src runs end-to-end per
query); at 10^12-file scale a build is hours and MUST resume without
recomputation (north rule). Design:

- The build is chunked by doc_id range, each chunk covering an integral
  number of salt buckets (chunk boundary ≡ bucket boundary, so chunk
  outputs are disjoint and the final index is their plain union).
- Stage 1 `tf`: per chunk, the zero-shuffle tf extraction lands in
  ``<out>/tf/chunk=<id>/`` with a manifest recording row counts, token
  totals, wall time and input lineage. The global avgdl — needed by the
  posting encoder for block-max impacts — is derived from ALL stage-1
  manifests, which is why the build is two-stage.
- Stage 2 `postings`: per chunk, the salted merge + block encode lands in
  ``<out>/postings/chunk=<id>/`` with its own manifest.
- Finalize: term_stats (map-side combined global df/cf), doc_stats,
  meta.json.

Idempotence: a chunk writes to a ``_tmp_<id>`` directory and renames into
place, then writes its manifest LAST — a manifest therefore proves the
chunk's data is complete. Resume = skip every chunk with a valid manifest
(checked against the same input lineage). Determinism: all writes are
sorted within partitions; a resumed build is value-identical to a
from-scratch build (tested).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dts.codec import BLOCK_SIZE
from dts.index_build import (
    DEFAULT_BUCKET_SIZE,
    build_postings,
    build_tf,
    term_stats,
)


def _manifest_path(out_dir: str, stage: str, chunk_id: int) -> str:
    return f"{out_dir}/_manifests/{stage}_chunk_{chunk_id:05d}.json"


def _read_manifest(out_dir: str, stage: str, chunk_id: int) -> dict | None:
    p = _manifest_path(out_dir, stage, chunk_id)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def _write_manifest(out_dir: str, stage: str, chunk_id: int, body: dict) -> None:
    os.makedirs(f"{out_dir}/_manifests", exist_ok=True)
    p = _manifest_path(out_dir, stage, chunk_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(body, f, indent=2, sort_keys=True)
    os.replace(tmp, p)


def _atomic_write(df: DataFrame, final_dir: str) -> None:
    """Write parquet to a tmp dir, rename into place (idempotent re-runs)."""
    tmp = final_dir + "._tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)


def build_index_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    lineage: str,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = BLOCK_SIZE,
    buckets_per_chunk: int = 8,
    positions: bool = False,
    strip_literals: bool = False,
    fail_after_chunks: int | None = None,
) -> dict:
    """Chunked, resumable build. `docs` needs (doc_id, content).

    ``lineage`` identifies the input (source path / snapshot id); a chunk
    checkpoint is only reused if its manifest carries the same lineage and
    build params. ``fail_after_chunks`` is a test hook: raise after N fresh
    chunk completions (simulates a killed job).
    """
    t_build0 = time.perf_counter()
    # `positions` participates in the checkpoint identity: a chunk built
    # without pos_blob must never be reused by a positional build.
    params = {
        "bucket_size": bucket_size,
        "block_size": block_size,
        "buckets_per_chunk": buckets_per_chunk,
        "positions": positions,
        "strip_literals": strip_literals,
    }
    # Same content-scanned-once policy as index_build.build_index: no
    # content cache/shuffle; widen only if the layout under-splits.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par * 2)
    id_agg = docs.agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    n_docs = int(id_agg["n"])
    docs_per_chunk = bucket_size * buckets_per_chunk
    n_chunks = max(1, -(-n_docs // docs_per_chunk))
    # Chunking covers exactly [0, n_chunks*docs_per_chunk): fail LOUDLY on
    # sparse/offset id spaces instead of silently dropping docs outside it.
    if n_docs and (
        int(id_agg["lo"]) < 0 or int(id_agg["hi"]) >= n_chunks * docs_per_chunk
    ):
        raise ValueError(
            "build_index_resumable requires dense 0-based doc_ids: got "
            f"range [{id_agg['lo']}, {id_agg['hi']}] for {n_docs} docs "
            f"(chunking covers [0, {n_chunks * docs_per_chunk})). "
            "Re-assign ids with dts.io.assign_doc_ids first."
        )
    completed_fresh = 0

    def _lineage_ok(m: dict | None, stage: str) -> bool:
        return (
            m is not None
            and m.get("lineage") == lineage
            and m.get("params") == params
            and m.get("status") == "complete"
        )

    # The reference's per-job timing contract is
    # "done in %lf s: %lf transmitting, %lf computing, %lf gathering"
    # (src/flexible_mpi.c:549-553). The Spark analogue per chunk:
    # computing = the transform+write job wall (Spark fuses the kernel and
    # the output transmit inside one job — recorded as one number, which
    # IS the honest split here), gathering = the read-back verification
    # aggregate (the driver-side reduce), transmitting = checkpoint
    # bookkeeping (manifest write + rename). Each chunk manifest carries
    # the breakdown; meta.json carries the summed totals.
    breakdown = {"computing": 0.0, "gathering": 0.0, "transmitting": 0.0}

    # ---- stage 1: tf per chunk -------------------------------------------
    for cid in range(n_chunks):
        if _lineage_ok(_read_manifest(out_dir, "tf", cid), "tf"):
            continue
        t0 = time.perf_counter()
        lo, hi = cid * docs_per_chunk, (cid + 1) * docs_per_chunk
        chunk_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tf = build_tf(chunk_docs, positions=positions, strip_literals=strip_literals)
        _atomic_write(tf, f"{out_dir}/tf/chunk={cid}")
        t_compute = time.perf_counter()
        back = spark.read.parquet(f"{out_dir}/tf/chunk={cid}")
        agg = back.agg(
            F.count("*").alias("rows"),
            F.sum("tf").alias("tokens"),
            F.countDistinct("doc_id").alias("docs_with_tokens"),
        ).collect()[0]
        t_gather = time.perf_counter()
        chunk_breakdown = {
            "computing": round(t_compute - t0, 3),
            "gathering": round(t_gather - t_compute, 3),
        }
        _write_manifest(
            out_dir,
            "tf",
            cid,
            {
                "status": "complete",
                "stage": "tf",
                "chunk_id": cid,
                "doc_lo": lo,
                "doc_hi": hi,
                "n_docs_in_chunk": int(
                    chunk_docs.count()
                ),
                "tf_rows": int(agg["rows"] or 0),
                "tokens": int(agg["tokens"] or 0),
                "docs_with_tokens": int(agg["docs_with_tokens"] or 0),
                "wall_sec": round(time.perf_counter() - t0, 3),
                "breakdown": chunk_breakdown,
                "lineage": lineage,
                "params": params,
            },
        )
        breakdown["computing"] += chunk_breakdown["computing"]
        breakdown["gathering"] += chunk_breakdown["gathering"]
        breakdown["transmitting"] += round(time.perf_counter() - t_gather, 3)
        completed_fresh += 1
        if fail_after_chunks is not None and completed_fresh >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {completed_fresh} chunks")

    # ---- global stats from stage-1 manifests -----------------------------
    total_tokens = 0
    for cid in range(n_chunks):
        m = _read_manifest(out_dir, "tf", cid)
        assert _lineage_ok(m, "tf"), f"missing tf manifest for chunk {cid}"
        total_tokens += m["tokens"]
    avgdl = total_tokens / n_docs if n_docs else 0.0

    # ---- stage 2: postings per chunk --------------------------------------
    for cid in range(n_chunks):
        if _lineage_ok(_read_manifest(out_dir, "postings", cid), "postings"):
            continue
        t0 = time.perf_counter()
        tf = spark.read.parquet(f"{out_dir}/tf/chunk={cid}")
        # No repartitionByRange (its sampling job would run the encode
        # twice); per-task term sort still yields row-group pruning.
        postings = build_postings(tf, avgdl, bucket_size, block_size)
        postings = postings.sortWithinPartitions("term", "bucket")
        _atomic_write(postings, f"{out_dir}/postings/chunk={cid}")
        t_compute = time.perf_counter()
        back = spark.read.parquet(f"{out_dir}/postings/chunk={cid}")
        agg = back.agg(
            F.count("*").alias("rows"), F.sum("n").alias("postings")
        ).collect()[0]
        nbytes = sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(f"{out_dir}/postings/chunk={cid}")
            for fn in fns
        )
        t_gather = time.perf_counter()
        chunk_breakdown = {
            "computing": round(t_compute - t0, 3),
            "gathering": round(t_gather - t_compute, 3),
        }
        _write_manifest(
            out_dir,
            "postings",
            cid,
            {
                "status": "complete",
                "stage": "postings",
                "chunk_id": cid,
                "rows": int(agg["rows"] or 0),
                "postings": int(agg["postings"] or 0),
                "bytes": int(nbytes),
                "avgdl_used": avgdl,
                "wall_sec": round(time.perf_counter() - t0, 3),
                "breakdown": chunk_breakdown,
                "lineage": lineage,
                "params": params,
            },
        )
        breakdown["computing"] += chunk_breakdown["computing"]
        breakdown["gathering"] += chunk_breakdown["gathering"]
        breakdown["transmitting"] += round(time.perf_counter() - t_gather, 3)
        completed_fresh += 1
        if fail_after_chunks is not None and completed_fresh >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {completed_fresh} chunks")

    # ---- finalize ----------------------------------------------------------
    all_tf = spark.read.parquet(f"{out_dir}/tf")
    stats = term_stats(all_tf.drop("chunk"))
    _atomic_write(
        stats.repartitionByRange(
            max(1, spark.sparkContext.defaultParallelism // 2), "term"
        ).sortWithinPartitions("term"),
        f"{out_dir}/term_stats",
    )
    from dts.index_build import write_reversed_terms, write_trigrams

    write_trigrams(spark, out_dir)
    write_reversed_terms(spark, out_dir)
    dl = all_tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    _atomic_write(
        docs.select("doc_id")
        .join(dl, "doc_id", "left")
        .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl")),
        f"{out_dir}/doc_stats",
    )
    meta = {
        "n_docs": int(n_docs),
        "next_doc_id": int(n_docs),  # dense 0-based ids enforced above
        "total_tokens": int(total_tokens),
        "avgdl": avgdl,
        "bucket_size": bucket_size,
        "block_size": block_size,
        "positions": positions,
        "strip_literals": bool(strip_literals and "lang" in docs.columns),
        "n_chunks": n_chunks,
        "lineage": lineage,
        "vocab_size": int(stats.count()),
        "build_wall_sec": round(time.perf_counter() - t_build0, 3),
        "chunks_fresh_this_run": completed_fresh,
        # Summed per-chunk breakdown — the engine's analogue of the
        # reference's "done in %lf s: %lf transmitting, %lf computing,
        # %lf gathering" line (src/flexible_mpi.c:549-553).
        "stage_breakdown_sec": {
            key: round(val, 3) for key, val in breakdown.items()
        },
    }
    from dts.index_build import save_meta

    save_meta(out_dir, meta)
    return meta
