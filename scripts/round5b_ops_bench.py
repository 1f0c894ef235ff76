"""Round-5 LATE-surface walls at 480k docs (tmpfs, local[8], warm best-of-2).

Evidence the late query surfaces hold at ~100× the pytest corpus:
- span queries (ordered span-near over positions);
- SynonymQuery blends (syn-row merge + one scoring job);
- match_phrase_prefix (expansion fused into one positional batch);
- rescore window (phrase rescorer on a bounded top-50 only);
- function_score (bucket-colocated doc values inside the kernel);
- search_after page-10 vs the naive deep top-k=100 it replaces;
- MultiReader search over two 240k half-indexes vs the single index.

Preps (cached in tmpfs, printed when built): a sidecar-enabled index
(store_fields=[n_chars]) and two half-corpus indexes.

Usage: python scripts/round5b_ops_bench.py [--corpus DIR] [--base DIR]
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

    spark = get_spark("r5bops", master="local[8]", shuffle_partitions=16)
    spark.range(1000).select(F.sum("id")).collect()

    from dts.index_build import build_index

    corpus = spark.read.parquet(args.corpus)
    out: dict[str, float] = {}

    pos_idx = f"{args.base}/corpus_480000_pos_index_c8"
    dv_idx = f"{args.base}/dv_480_idx"
    if not os.path.exists(f"{dv_idx}/meta.json"):
        t0 = time.perf_counter()
        build_index(
            spark,
            corpus.select(
                "doc_id", "content",
                F.length("content").cast("long").alias("n_chars"),
            ),
            dv_idx, bucket_size=4096, store_fields=["n_chars"],
        )
        out["prep_build_dv"] = round(time.perf_counter() - t0, 2)
    half_a = f"{args.base}/mi_480_a"
    half_b = f"{args.base}/mi_480_b"
    if not os.path.exists(f"{half_b}/meta.json"):
        t0 = time.perf_counter()
        build_index(
            spark,
            corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id", "content"),
            half_a, bucket_size=4096,
        )
        build_index(
            spark,
            corpus.filter(F.col("doc_id") % 2 == 1).select("doc_id", "content"),
            half_b, bucket_size=4096,
        )
        out["prep_build_halves"] = round(time.perf_counter() - t0, 2)

    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{pos_idx}/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]
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

    from dts.docvalues import function_score_topk
    from dts.multi_index import multi_index_topk
    from dts.phrase import phrase_prefix_counts
    from dts.rescore import rescore_topk
    from dts.score_index import bm25_topk_indexed
    from dts.spans import span_near_counts
    from dts.synonym import bm25_topk_synonyms

    span_qs = spark.createDataFrame(
        [(i, bigrams[i % len(bigrams)], 2 + i % 3) for i in range(8)],
        "sq_id long, text string, slop int",
    )
    stage("span_near8", lambda: span_near_counts(spark, pos_idx, span_qs).count())

    syn_map = {vocab[i]: [vocab[i + 1]] for i in range(0, 16, 2)}
    syn_qs = spark.createDataFrame(
        [(i, f"{vocab[(i * 2) % 16]} {vocab[(i * 19 + 3) % 400]}") for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "synonym8",
        lambda: bm25_topk_synonyms(spark, pos_idx, syn_qs, syn_map, k=10).count(),
    )

    pp_qs = spark.createDataFrame(
        [(i, f"{bigrams[i % len(bigrams)].split()[0]} {vocab[(i * 31) % 400][:3]}")
         for i in range(8)],
        "pp_id long, text string",
    )
    stage(
        "phrase_prefix8",
        lambda: phrase_prefix_counts(spark, pos_idx, pp_qs).count(),
    )

    rs_qs = spark.createDataFrame(
        [(i, bigrams[i % len(bigrams)]) for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "rescore8",
        lambda: rescore_topk(spark, pos_idx, rs_qs, k=10, window=50).count(),
    )

    fs_qs = spark.createDataFrame(
        [(i, f"{vocab[(i * 7) % 400]} {vocab[(i * 7 + 1) % 400]}") for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "function_score8",
        lambda: function_score_topk(
            spark, dv_idx, fs_qs, "n_chars", k=10
        ).count(),
    )

    mi_qs = spark.createDataFrame(
        [(i, f"{vocab[(i * 7) % 400]} {vocab[(i * 7 + 1) % 400]}") for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "multi_index8",
        lambda: multi_index_topk(spark, [half_a, half_b], mi_qs, k=10).count(),
    )
    stage(
        "single_index8",
        lambda: bm25_topk_indexed(spark, dv_idx, mi_qs, k=10).count(),
    )

    # Deep pagination: page 10 (ranks 91-100) via search_after's k-heap
    # vs the naive k=100 collection it replaces.
    pg_qs = spark.createDataFrame(
        [(i, f"{vocab[(i * 3) % 400]} {vocab[(i * 3 + 1) % 400]}") for i in range(8)],
        "query_id long, text string",
    )
    deep = bm25_topk_indexed(spark, dv_idx, pg_qs, k=90).toPandas()
    cursor = {
        int(qid): (float(g.iloc[-1]["score"]), int(g.iloc[-1]["doc_id"]))
        for qid, g in deep.sort_values(["query_id", "rank"]).groupby("query_id")
    }
    stage(
        "search_after_page10",
        lambda: bm25_topk_indexed(
            spark, dv_idx, pg_qs, k=10, search_after=cursor
        ).count(),
    )
    stage(
        "naive_page10",
        lambda: bm25_topk_indexed(spark, dv_idx, pg_qs, k=100).count(),
    )

    from dts.percolate import percolate

    perc_qs = [
        (0, f"{vocab[3]} {vocab[9]}"),
        (1, f"+{vocab[5]} -{vocab[40]}"),
        (2, f'"{bigrams[0]}"'),
        (3, f'+{vocab[7]} "{bigrams[1]}"~3'),
    ]
    stage(
        "percolate_480k_4q",
        lambda: percolate(
            corpus.select("doc_id", "content"), perc_qs, text_col="content"
        ).count(),
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
