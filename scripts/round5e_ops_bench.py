"""Round-5 session-7 surface walls at 480k docs / 100k vectors (tmpfs,
local[8], warm best-of-2). Evidence the session's surfaces hold at ~100×
the pytest corpus:

- combined_fields (BM25F) over the 480k two-field index;
- unordered intervals (anchor-cover positional sweep) on the 480k
  positional index;
- pipeline aggs + bucket extrema over the daily histogram (bucket-sized);
- CCNet LM perplexity: the full 480k token-level LM join + per-doc fold
  (LM tables = the persisted 480k bigram table + one unigram pass);
- C4 blocklist filter (one codegen map pass);
- residual IVF-PQ encode + search at 100k×64 (vs round-5d's
  non-residual ivfpq_100k_5q);
- index sorting: sort_index_meta build + early-terminated sorted fetch
  vs the full-sidecar sort (the O(k)-IO story, measured);
- has_child/has_parent on TPC-H sf0.1 orders/lineitem.

Usage: python scripts/round5e_ops_bench.py [--corpus DIR] [--base DIR]
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
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("r5eops", master="local[8]", shuffle_partitions=16)
    spark.range(1000).select(F.sum("id")).collect()

    corpus = spark.read.parquet(args.corpus)
    out: dict[str, float] = {}

    def stage(name, fn, reps=2):
        if args.only is not None and name not in args.only:
            return
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        out[name] = round(best, 2)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

    docs = corpus.select("doc_id", F.col("content").alias("text"), "lang")

    # ---- combined_fields over the persisted 480k two-field index
    from dts.multifield import combined_fields_topk

    mf_dir = f"{args.base}/mf_480k_cf"
    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{mf_dir}/field=text/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]
    q8 = spark.createDataFrame(
        [(i, f"{vocab[(i * 13) % 390]} {vocab[(i * 13 + 5) % 390]}")
         for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "combined_fields_480k_8q",
        lambda: combined_fields_topk(spark, mf_dir, q8, k=10).count(),
    )

    # ---- unordered intervals on the 480k positional index
    from dts.spans import interval_unordered_counts

    pos_idx = f"{args.base}/corpus_480000_pos_index_c8"
    iq = spark.createDataFrame(
        [(i, f"{vocab[(i * 7) % 390]} {vocab[(i * 7 + 11) % 390]}", 3)
         for i in range(4)],
        "iq_id long, text string, max_gaps int",
    )
    stage(
        "intervals_480k_4q",
        lambda: interval_unordered_counts(spark, pos_idx, iq).count(),
    )

    # ---- pipeline aggs over a daily histogram (bucket-sized work)
    from dts.facet import (
        bucket_extrema, facet_date_histogram, multi_terms, pipeline_aggs,
        weighted_avg,
    )

    ev = docs.select(
        "doc_id",
        F.expr(
            "timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, "
            "doc_id % 7776000)"
        ).alias("ts"),
    )
    stage(
        "pipeline_aggs_480k",
        lambda: pipeline_aggs(
            facet_date_histogram(None, ev, "ts", "day"),
            "bucket_ts", "n", window=7, lag=7,
        ).collect(),
    )
    stage(
        "bucket_extrema_480k",
        lambda: bucket_extrema(
            facet_date_histogram(None, ev, "ts", "day"), "bucket_ts", "n"
        ).collect(),
    )
    stage(
        "multi_terms_480k",
        lambda: multi_terms(
            None,
            docs.select("doc_id", "lang", (F.col("doc_id") % 31).alias("g")),
            ["lang", "g"],
        ).count(),
    )
    stage(
        "weighted_avg_480k",
        lambda: weighted_avg(
            None,
            docs.select(
                "doc_id", F.length("text").alias("v"),
                (F.col("doc_id") % 5 + 1).alias("w"),
            ),
            "v", "w",
        ).collect(),
    )

    # ---- CCNet LM perplexity over the full 480k corpus
    from dts.lmscore import doc_lm_perplexity, unigram_counts

    uni_path = f"{args.base}/unigrams_480k"
    if not os.path.exists(uni_path):
        t0 = time.perf_counter()
        unigram_counts(docs).write.mode("overwrite").parquet(uni_path)
        out["prep_unigrams"] = round(time.perf_counter() - t0, 2)
        print(f"# prep_unigrams: {out['prep_unigrams']}", file=sys.stderr,
              flush=True)
    bgr = spark.read.parquet(f"{args.base}/bigrams_480k")
    uni = spark.read.parquet(uni_path)
    stage(
        "lm_ppl_480k",
        lambda: doc_lm_perplexity(docs, bgr, uni).agg(
            F.sum("ppl6")
        ).collect(),
        reps=1,
    )

    # ---- C4 blocklist (one codegen map pass)
    from dts.textstats import blocklist_filter

    stage(
        "blocklist_480k",
        lambda: blocklist_filter(
            docs, ["zzqqnever", vocab[389], vocab[388]]
        ).count(),
    )

    # ---- residual IVF-PQ at 100k×64 (same md5 vectors as round-4/5d)
    import numpy as np

    from dts.similarity import (
        _as_double, _ivf_centroids, pq_train_residual, rpq_encode, rpq_topk,
    )

    emb = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> cast(conv(substring(md5("
            "concat('v', cast(id as string), ':', cast(d as string))), 1, 8),"
            " 16, 10) as double) / 4294967296.0 - 0.5)"
        ).alias("embedding"),
    )
    qv = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
    rows = _ivf_centroids(e0, 64, "bench").collect()
    cids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cmat = np.array([r["c"] for r in rows], dtype=np.float64)
    rcb = pq_train_residual(emb, cids, cmat, m=16, ksub=256, seed="bench")
    rpq_path = f"{args.base}/rpq_enc_100k"
    if args.only is None or "rpq_encode_100k" in (args.only or []) or not os.path.exists(rpq_path):
        stage(
            "rpq_encode_100k",
            lambda: rpq_encode(emb, rcb, cids, cmat)
            .write.mode("overwrite").parquet(rpq_path),
            reps=1,
        )
    renc = spark.read.parquet(rpq_path)
    stage(
        "rpq_100k_5q",
        lambda: rpq_topk(
            renc, qv, rcb, nprobe=8, k=10, rerank=100, cents=(cids, cmat)
        ).count(),
    )

    # ---- index sorting: early-terminated fetch vs full-sidecar sort
    from dts.docvalues import sort_index_meta, sorted_topk_indexed

    dv_idx = f"{args.base}/dv_480_idx"
    if not os.path.isdir(f"{dv_idx}/sorted_meta_n_chars"):
        t0 = time.perf_counter()
        sort_index_meta(spark, dv_idx, "n_chars", n_bins=64)
        out["prep_sort_meta"] = round(time.perf_counter() - t0, 2)
        print(f"# prep_sort_meta: {out['prep_sort_meta']}", file=sys.stderr,
              flush=True)

    def _sorted_fetch():
        df, bins_read = sorted_topk_indexed(
            spark, dv_idx, "n_chars", k=100, ascending=True,
            return_bins_read=True,
        )
        df.count()
        out["sorted_fetch_bins_read"] = bins_read

    stage("sorted_fetch_480k_k100", _sorted_fetch)

    def _full_sort():
        from pyspark.sql import Window

        side = spark.read.parquet(f"{dv_idx}/doc_meta")
        w = Window.partitionBy().orderBy(
            F.col("n_chars").asc(), F.col("doc_id").asc()
        )
        side.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= 100
        ).count()

    stage("sort_full_480k_k100", _full_sort)

    # ---- parent-child joins on TPC-H sf0.1
    from dts.joinquery import has_child, has_parent

    orders = spark.read.parquet(f"{args.sf}/orders.parquet")
    li = spark.read.parquet(f"{args.sf}/lineitem.parquet")
    stage(
        "has_child_sf01",
        lambda: has_child(
            orders, li.withColumn("_score", F.col("l_extendedprice")),
            "o_orderkey", "l_orderkey",
            "l_quantity >= 45 AND l_discount <= 0.02",
            score_mode="max", min_children=2,
        ).count(),
    )
    stage(
        "has_parent_sf01",
        lambda: has_parent(
            orders, li, "o_orderkey", "l_orderkey",
            "o_orderpriority = '1-URGENT' AND o_totalprice >= 150000",
        ).count(),
    )

    # ---- late session-7 surfaces
    from dts.dedup import dedup_paragraphs
    from dts.docvalues import rank_feature_topk
    from dts.facet import adjacency_matrix
    from dts.wildcard import match_bool_prefix_topk

    stage(
        "adjacency_matrix_480k",
        lambda: adjacency_matrix(
            None,
            docs.select("doc_id", F.length("text").alias("n_chars"), "lang"),
            {"short": "n_chars < 300", "py": "lang = 'python'",
             "go": "lang = 'go'"},
        ).collect(),
    )
    # plant newlines so line dedup has real work: every ' the ' split
    para = docs.select(
        "doc_id",
        F.expr("replace(coalesce(text, ''), ' the ', char(10))").alias(
            "text"
        ),
    )
    stage(
        "dedup_paragraphs_480k",
        lambda: dedup_paragraphs(para, min_count=2).agg(
            F.sum("n_removed")
        ).collect(),
        reps=1,
    )
    mbp = spark.createDataFrame(
        [(i, f"{vocab[(i * 3) % 390]} {vocab[(i * 3 + 1) % 390][:2]}")
         for i in range(8)],
        "query_id long, text string",
    )
    idx_480 = f"{args.base}/corpus_480000_ids_index_c16"
    stage(
        "match_bool_prefix_480k_8q",
        lambda: match_bool_prefix_topk(
            spark, idx_480, mbp, k=10, max_expansions=50
        ).count(),
    )
    dv_q = spark.createDataFrame(
        [(i, f"{vocab[(i * 5) % 390]} {vocab[(i * 5 + 2) % 390]}")
         for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "rank_feature_480k_8q",
        lambda: rank_feature_topk(
            spark, f"{args.base}/dv_480_idx", dv_q, "n_chars",
            function="saturation", pivot=300.0, k=10,
        ).count(),
    )

    from dts.docvalues import script_score_topk
    from dts.geo import geo_distance_topk
    from dts.textstats import gopher_quality

    stage(
        "gopher_quality_480k",
        lambda: gopher_quality(
            docs.select(
                "doc_id",
                F.expr(
                    "concat(replace(coalesce(text, ''), ' the ', "
                    "concat(char(10), '- ')), '...')"
                ).alias("text"),
            )
        ).agg(F.sum(F.col("passes").cast("long"))).collect(),
    )
    stage(
        "geo_distance_480k",
        lambda: geo_distance_topk(
            docs.select(
                "doc_id",
                F.expr("(doc_id * 37 % 17000) / 100.0e0 - 85.0e0").alias("lat"),
                F.expr("(doc_id * 73 % 36000) / 100.0e0 - 180.0e0").alias("lon"),
            ),
            "lat", "lon", 10.0, 20.0, k=100, radius_m=3_000_000.0,
        ).count(),
    )
    stage(
        "script_score_480k_8q",
        lambda: script_score_topk(
            spark, f"{args.base}/dv_480_idx", dv_q,
            "_score * ln(1.0e0 + n_chars)", fields=("n_chars",), k=10,
        ).count(),
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
