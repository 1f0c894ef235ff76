"""Round-5 operator walls at 480k docs (tmpfs, local[8], warm best-of-2).

Evidence the round-5 surfaces hold at ~100× the pytest corpus:
- fused phrase batches (filter + scored modes) vs the phrase-free
  parser wall (round-4 verdict #5: "approaches the 2.3 s wall");
- the clause-budgeted regex rewrite (constant-score default) vs the old
  unbudgeted scored path (verdict #2);
- the unified multifield grammar (search_fields) over a 2-field index;
- IVF with the map-side assignment (verdict #1), plus a Lloyd sweep.

Prep (not timed as stages, but printed): a positional index and a
2-field multifield index over the same corpus, built once into tmpfs
and reused across runs.

Usage: python scripts/round5_ops_bench.py [--corpus DIR] [--base DIR]
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
    ap.add_argument("--corpus", default="/dev/shm/dts_bench/corpus_480000_ids")
    ap.add_argument("--base", default="/dev/shm/dts_bench")
    args = ap.parse_args()

    spark = get_spark("r5ops", master="local[8]", shuffle_partitions=16)
    spark.range(1000).select(F.sum("id")).collect()

    from dts.index_build import build_index
    from dts.multifield import build_multifield_index
    from dts.parser import search_batch, search_fields
    from dts.wildcard import bm25_topk_regex

    corpus = spark.read.parquet(args.corpus)
    out: dict[str, float] = {}

    pos_idx = f"{args.base}/corpus_480000_pos_index_c8"
    if not os.path.isdir(f"{pos_idx}/meta.json") and not os.path.exists(
        f"{pos_idx}/meta.json"
    ):
        t0 = time.perf_counter()
        build_index(
            spark, corpus.select("doc_id", "content"), pos_idx,
            bucket_size=4096, positions=True,
        )
        out["prep_build_pos"] = round(time.perf_counter() - t0, 2)
    mf_idx = f"{args.base}/mf_480_idx"
    if not os.path.exists(f"{mf_idx}/meta.json"):
        t0 = time.perf_counter()
        build_multifield_index(
            spark, corpus.select("doc_id", "content", "path"), mf_idx,
            {"content": 1.0, "path": 2.0}, bucket_size=4096,
        )
        out["prep_build_mf"] = round(time.perf_counter() - t0, 2)
    mf_pos_idx = f"{args.base}/mf_480_pos_idx"
    if not os.path.exists(f"{mf_pos_idx}/meta.json"):
        t0 = time.perf_counter()
        build_multifield_index(
            spark, corpus.select("doc_id", "content", "path"), mf_pos_idx,
            {"content": 1.0, "path": 2.0}, bucket_size=4096, positions=True,
        )
        out["prep_build_mf_pos"] = round(time.perf_counter() - t0, 2)

    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{pos_idx}/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]
    # Real bigrams from the corpus (phrases that actually match): take
    # the first two tokens of sampled docs.
    samp = [
        r["content"].split()[:2]
        for r in corpus.select("content").limit(64).collect()
    ]
    bigrams = [" ".join(s) for s in samp if len(s) >= 2][:8]

    def stage(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        out[name] = round(best, 2)
        print(f"# {name}: {out[name]}", file=sys.stderr)

    qs_plain = [
        f"{vocab[(i * 7) % 400]} +{vocab[(i * 7 + 1) % 400]} "
        f"-{vocab[(i * 29 + 2) % 400]}"
        for i in range(8)
    ]
    qs_phrase = [
        f'{vocab[(i * 7) % 400]} +{vocab[(i * 7 + 1) % 400]} "{bigrams[i % len(bigrams)]}"'
        for i in range(8)
    ]
    stage(
        "parser_search8",
        lambda: search_batch(
            spark, pos_idx, qs_plain, k=10, broadcast_filter=False
        ).count(),
    )
    stage(
        "parser_phrase8_filter",
        lambda: search_batch(
            spark, pos_idx, qs_phrase, k=10, broadcast_filter=False
        ).count(),
    )
    stage(
        "parser_phrase8_scored",
        lambda: search_batch(
            spark, pos_idx, qs_phrase, k=10, broadcast_filter=False,
            phrase_mode="scored",
        ).count(),
    )

    # Wide two-char-prefix regexes: budgeted default (constant-score
    # auto-switch) vs the lifted-cap scored path the old code always paid.
    rx = [(i, f"{vocab[i * 3][:2]}.*") for i in range(20)]
    rx_df = spark.createDataFrame(rx, "rq_id long, pattern string")
    stage(
        "regex_topk20_budgeted",
        lambda: bm25_topk_regex(spark, pos_idx, rx_df, k=20).count(),
    )
    stage(
        "regex_topk20_scored_unbudgeted",
        lambda: bm25_topk_regex(
            spark, pos_idx, rx_df, k=20, max_clauses=10**9
        ).count(),
    )

    mf_qs = [
        f"path:{vocab[(i * 11) % 400]} +{vocab[(i * 5) % 400]} "
        f"{vocab[(i * 13 + 1) % 400]}"
        for i in range(40)
    ]
    stage(
        "search_fields40",
        lambda: search_fields(spark, mf_idx, mf_qs, k=10).count(),
    )
    # Phrase-carrying field-scoped batch (positional 2-field index):
    # phrases ride the per-field candidates jobs as synthetic clause
    # rows — no post-combine allow/deny joins.
    mf_ph_qs = [
        f'+{vocab[(i * 5) % 400]} "{bigrams[i % len(bigrams)]}" '
        f"path:{vocab[(i * 11) % 400]}"
        for i in range(16)
    ]
    stage(
        "search_fields16_phrase",
        lambda: search_fields(spark, mf_pos_idx, mf_ph_qs, k=10).count(),
    )

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
    stage(
        "ivf_100k_5q_lloyd1",
        lambda: ivf_topk(
            emb, qv, k=10, n_centroids=64, nprobe=8, lloyd_iters=1
        ).count(),
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
