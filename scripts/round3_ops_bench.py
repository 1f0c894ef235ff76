"""Round-3 operator walls at 480k docs (tmpfs, local[8], warm best-of-2).

Evidence that the new query surfaces hold up at ~100× the pytest corpus:
boolean matching, wildcard rewrite top-k, AND-mode ranking, snippets,
facets, and the deletion lifecycle (tombstoned query + compaction) on the
same 480k-doc index the N→4N scaling sessions use.

Usage: python scripts/round3_ops_bench.py [--index DIR] [--corpus DIR]
Prints one JSON line {stage: best_sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dts.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="/dev/shm/dts_bench/corpus_480000_ids_index_c8")
    ap.add_argument("--corpus", default="/dev/shm/dts_bench/corpus_480000_ids")
    args = ap.parse_args()

    spark = get_spark("r3ops", master="local[8]", shuffle_partitions=16)
    spark.range(1000).select(F.sum("id")).collect()

    from dts.boolquery import boolean_match_docs
    from dts.delete import delete_docs
    from dts.facet import facet_counts
    from dts.index_build import compact_index
    from dts.score_index import bm25_topk_indexed
    from dts.snippet import snippet_matches
    from dts.wildcard import bm25_topk_wildcard

    # Work on a COPY: deletion/compaction must not mutate the shared
    # scaling-bench index.
    idx = args.index + "_r3ops"
    if os.path.exists(idx):
        shutil.rmtree(idx)
    shutil.copytree(args.index, idx)

    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{idx}/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]
    corpus = spark.read.parquet(args.corpus)

    out: dict[str, float] = {}

    def stage(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", file=sys.stderr)

    bq = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 11) % 400]} {vocab[(i * 17 + 1) % 400]}",
             vocab[(i * 29 + 2) % 400] if i % 2 else "")
            for i in range(20)
        ],
        "bq_id long, must string, must_not string",
    )
    stage("boolean_batch20", lambda: boolean_match_docs(spark, idx, bq).count())

    wq = spark.createDataFrame(
        [(i, vocab[(i * 13) % 400][:3] + "*") for i in range(20)],
        "wq_id long, pattern string",
    )
    stage("wildcard_topk20", lambda: bm25_topk_wildcard(spark, idx, wq, k=10).count())
    from dts.wildcard import wildcard_match_docs

    stage("wildcard_docs20", lambda: wildcard_match_docs(spark, idx, wq).count())

    q40 = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 7) % 400]} {vocab[(i * 7 + 1) % 400]}", 0)
            for i in range(40)
        ],
        "query_id long, text string, fuzzy_k int",
    )
    stage("and_batch40", lambda: bm25_topk_indexed(spark, idx, q40, k=10, mode="and").count())
    stage("or_batch40", lambda: bm25_topk_indexed(spark, idx, q40, k=10).count())

    spat = spark.createDataFrame(
        [(i, vocab[(i * 31) % 400]) for i in range(8)],
        "pat_id long, pattern string",
    )
    stage("snippet8", lambda: snippet_matches(corpus, spat).count())

    matches = boolean_match_docs(spark, idx, bq)
    stage(
        "facet_lang",
        lambda: facet_counts(matches, corpus, "lang", key="bq_id").count(),
    )

    # Multi-field: content (1.0) + path (2.0) sub-indexes at 480k docs,
    # then a 40-query mixed batch (scoped + default clauses).
    from dts.multifield import bm25_topk_multifield, build_multifield_index

    mf_dir = idx + "_mf"
    if os.path.exists(mf_dir):
        shutil.rmtree(mf_dir)
    t0 = time.perf_counter()
    build_multifield_index(
        spark, corpus, mf_dir, {"content": 1.0, "path": 2.0}
    )
    out["multifield_build"] = round(time.perf_counter() - t0, 3)
    mfq = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 7) % 400]} path:mod{i % 16} {vocab[(i * 7 + 1) % 400]}")
            for i in range(40)
        ],
        "query_id long, text string",
    )
    stage(
        "multifield_batch40",
        lambda: bm25_topk_multifield(spark, mf_dir, mfq, k=10).count(),
    )
    shutil.rmtree(mf_dir)

    # Deletion lifecycle: tombstone 0.1% (480 docs), query through the
    # mask, then compact (physical apply + stats recompute + re-encode).
    delete_docs(
        spark, idx, corpus.filter(F.col("doc_id") % 1000 == 7).select("doc_id")
    )
    stage("tombstoned_or_batch40", lambda: bm25_topk_indexed(spark, idx, q40, k=10).count())
    t0 = time.perf_counter()
    compact_index(spark, idx)
    out["compact_with_deletes"] = round(time.perf_counter() - t0, 3)
    stage("post_compact_or_batch40", lambda: bm25_topk_indexed(spark, idx, q40, k=10).count())

    shutil.rmtree(idx)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
