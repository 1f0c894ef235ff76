"""Round-4 operator walls at 480k docs (tmpfs, local[8], warm best-of-2).

Evidence the round-4 surfaces hold at ~100× the pytest corpus: filtered
search, BooleanQuery SHOULD/msm, regex rewrite, the query-string parser,
MoreLikeThis, deterministic sampling, the dedup policy, and IVF ANN on
the synthetic embeddings.

Usage: python scripts/round4_ops_bench.py [--index DIR] [--corpus DIR]
Prints one JSON line {stage: best_sec}.
"""

from __future__ import annotations

import argparse
import json
import os
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

    spark = get_spark("r4ops", master="local[8]", shuffle_partitions=16)
    spark.range(1000).select(F.sum("id")).collect()

    from dts.boolquery import boolean_match_docs
    from dts.dedup import dedup_corpus
    from dts.mlt import more_like_this
    from dts.parser import search
    from dts.sample import stratified_hash_sample
    from dts.score_index import bm25_topk_indexed
    from dts.wildcard import bm25_topk_regex

    idx = args.index
    corpus = spark.read.parquet(args.corpus)
    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{idx}/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]

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

    q40 = spark.createDataFrame(
        [(i, f"{vocab[(i * 7) % 400]} {vocab[(i * 7 + 1) % 400]}", 0)
         for i in range(40)],
        "query_id long, text string, fuzzy_k int",
    )
    # filter context: every 3rd doc eligible (corpus-scale allow-list —
    # the broadcast_filter=False regime)
    flt = corpus.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    stage(
        "filtered_or_batch40",
        lambda: bm25_topk_indexed(
            spark, idx, q40, k=10, doc_filter=flt, broadcast_filter=False
        ).count(),
    )
    stage("or_batch40_baseline",
          lambda: bm25_topk_indexed(spark, idx, q40, k=10).count())

    bsq = spark.createDataFrame(
        [
            (i, vocab[(i * 11) % 400],
             f"{vocab[(i * 17 + 1) % 400]} {vocab[(i * 23 + 2) % 400]}",
             "", 1)
            for i in range(20)
        ],
        "bq_id long, must string, should string, must_not string, msm int",
    )
    stage("boolean_should20",
          lambda: boolean_match_docs(spark, idx, bsq).count())

    rq = spark.createDataFrame(
        [(i, f"{vocab[(i * 13) % 400][:2]}[a-z]+") for i in range(20)],
        "rq_id long, pattern string",
    )
    stage("regex_topk20", lambda: bm25_topk_regex(spark, idx, rq, k=10).count())

    stage(
        "parser_search8",
        lambda: [
            search(
                spark, idx,
                f"{vocab[(i * 7) % 400]} +{vocab[(i * 7 + 1) % 400]} "
                f"-{vocab[(i * 29 + 2) % 400]}",
                k=10, broadcast_filter=False,
            ).count()
            for i in range(8)
        ],
    )

    seeds = [1000 * i + 7 for i in range(8)]
    stage("mlt_seeds8", lambda: more_like_this(spark, idx, seeds, k=10).count())

    stage(
        "sample_stratified",
        lambda: stratified_hash_sample(
            corpus, {"python": 1.0, "go": 0.1}, stratum_col="lang",
            default_fraction=0.5,
        ).count(),
    )
    stage(
        "dedup_corpus_exact",
        lambda: dedup_corpus(corpus, text_col="content", method="exact").count(),
    )

    # IVF on synthetic embeddings (480k docs have no embedding column;
    # derive 64-dim vectors deterministically from doc_id via md5 — the
    # plumbing under test is assignment/probing/re-rank, not the vectors)
    emb = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> cast(conv(substring(md5("
            "concat('v', cast(id as string), ':', cast(d as string))), 1, 8),"
            " 16, 10) as double) / 4294967296.0 - 0.5)"
        ).alias("embedding"),
    )
    from dts.similarity import ivf_topk

    qv = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    stage(
        "ivf_100k_5q",
        lambda: ivf_topk(emb, qv, k=10, n_centroids=64, nprobe=8).count(),
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
