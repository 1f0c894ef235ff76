"""Round-5 session-5 surface walls at 480k docs (tmpfs, local[8], warm
best-of-2). Evidence the newest surfaces hold at ~100× the pytest corpus:

- significant_terms (index-backed background, hit-sized foreground);
- top_hits / stats / cardinality / percentiles aggregations;
- LM Dirichlet scoring (cf-aware kernel plug);
- term-vector fetches from the doc-major sidecar;
- winnowing span-pair dedup + benchmark decontamination (corpus-wide);
- PII scrub + analyzer rewrite (pure map passes — scan-bound);
- (upsert_docs composes delete_docs + merge_index, both already
  measured in earlier rounds' delete/merge stages — no new plan shape.)

Usage: python scripts/round5c_ops_bench.py [--corpus DIR] [--base DIR]
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
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these stages (default all)")
    args = ap.parse_args()

    spark = get_spark("r5cops", master="local[8]", shuffle_partitions=16)
    spark.range(1000).select(F.sum("id")).collect()

    from dts.index_build import build_index

    corpus = spark.read.parquet(args.corpus)
    out: dict[str, float] = {}

    dv_idx = f"{args.base}/dv_480_idx"
    tv_idx = f"{args.base}/tv_480_idx"
    if not os.path.exists(f"{tv_idx}/meta.json"):
        t0 = time.perf_counter()
        build_index(
            spark, corpus.select("doc_id", "content"), tv_idx,
            bucket_size=4096, store_term_vectors=True,
        )
        out["prep_build_tv"] = round(time.perf_counter() - t0, 2)

    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{dv_idx}/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]

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

    from dts.facet import (
        facet_cardinality,
        facet_percentiles,
        facet_stats,
        significant_terms_indexed,
        top_hits,
    )
    from dts.score_index import bm25_topk_indexed

    qs = spark.createDataFrame(
        [(i, f"{vocab[(i * 7) % 400]} {vocab[(i * 7 + 1) % 400]}")
         for i in range(8)],
        "query_id long, text string",
    )
    # hit-sized foreground shared by the agg stages: top-200 per query
    matches = bm25_topk_indexed(spark, dv_idx, qs, k=200).cache()
    matches.count()

    docs = corpus.select("doc_id", "content")
    meta_side = spark.read.parquet(f"{dv_idx}/doc_meta")  # (doc_id, n_chars)

    stage(
        "sig_terms8",
        lambda: significant_terms_indexed(
            spark, dv_idx, matches, docs, key="query_id", text_col="content",
            size=10, min_doc_count=3,
        ).count(),
    )
    cat = docs.select(
        "doc_id", (F.col("doc_id") % 100).alias("cat")
    )
    stage(
        "top_hits8",
        lambda: top_hits(
            matches, cat, "cat", key="query_id", n=3
        ).count(),
    )
    stage(
        "facet_stats8",
        lambda: facet_stats(
            matches, meta_side, "n_chars", key="query_id"
        ).count(),
    )
    stage(
        "facet_cardinality8",
        lambda: facet_cardinality(
            matches, cat, "cat", key="query_id", exact=False
        ).count(),
    )
    stage(
        "facet_percentiles8",
        lambda: facet_percentiles(
            matches, meta_side, "n_chars", key="query_id"
        ).count(),
    )
    stage(
        "lmd8",
        lambda: bm25_topk_indexed(
            spark, dv_idx, qs, k=10, similarity="lmd"
        ).count(),
    )

    from dts.docvalues import decay_score_topk

    stage(
        "decay8",
        lambda: decay_score_topk(
            spark, dv_idx, qs, "n_chars", origin=2000.0, scale=1500.0,
            kind="gauss", k=10,
        ).count(),
    )

    from dts.termvectors import term_vectors

    fetch_ids = [int(i * 30011) % 480000 for i in range(16)]
    stage(
        "term_vectors16",
        lambda: term_vectors(spark, tv_idx, doc_ids=fetch_ids).count(),
    )

    from dts.dedup import contamination_pairs, winnowed_span_pairs

    # max_fp_df=20: the boilerplate cap is the production config — a
    # fingerprint shared by >20 docs is license-header-grade and its
    # df² join term is exactly the blowup the cap exists to kill.
    stage(
        "span_pairs_480k",
        lambda: winnowed_span_pairs(
            docs, k=8, w=4, max_fp_df=20, text_col="content", hash="fast"
        ).count(),
        reps=1,
    )
    bench = docs.filter(F.col("doc_id") % 7501 == 3).select(
        F.col("doc_id").alias("bench_id"),
        F.expr(
            "array_join(slice(regexp_extract_all(lower(coalesce(content, '')),"
            " '[a-z0-9]+', 0), 1, 60), ' ')"
        ).alias("text"),
    )  # 64 synthetic eval docs
    stage(
        "contamination_480k",
        lambda: contamination_pairs(
            docs, bench, n=8, min_shared=2, text_col="content"
        ).count(),
        reps=1,
    )

    # --- latest surfaces: phrase suggester, SQ/filtered ANN, DV update
    from dts.phrasesuggest import bigram_counts, suggest_phrases

    bg_path = f"{args.base}/bigrams_480k"
    if not os.path.exists(bg_path):
        t0 = time.perf_counter()
        bigram_counts(docs, text_col="content").write.parquet(bg_path)
        out["prep_bigrams"] = round(time.perf_counter() - t0, 2)
    bg = spark.read.parquet(bg_path)
    ps_qs = [(i, f"{vocab[(i * 13) % 400]}x {vocab[(i * 13 + 1) % 400]}")
             for i in range(8)]
    stage(
        "phrase_suggest8",
        lambda: suggest_phrases(
            spark, dv_idx, ps_qs, bg, max_k=1, per_token=3, n=3
        ).count(),
    )

    emb100k = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> cast(conv(substring(md5("
            "concat('v', cast(id as string), ':', cast(d as string))), 1, 8),"
            " 16, 10) as double) / 4294967296.0 - 0.5)"
        ).alias("embedding"),
    )
    qv100k = emb100k.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    from dts.similarity import cosine_topk_bruteforce, sq_topk

    stage(
        "sq_100k_5q",
        lambda: sq_topk(emb100k, qv100k, k=10, rerank=50).count(),
    )
    from dts.similarity import sq_encode

    sq_path = f"{args.base}/sq_100k"
    if not os.path.exists(sq_path):
        t0 = time.perf_counter()
        sq_encode(emb100k).write.parquet(sq_path)
        out["prep_sq_encode"] = round(time.perf_counter() - t0, 2)
    sq_enc = spark.read.parquet(sq_path)
    stage(
        "sq_100k_5q_encoded",
        lambda: sq_topk(sq_enc, qv100k, k=10, rerank=50).count(),
    )
    stage(
        "brute_100k_5q",
        lambda: cosine_topk_bruteforce(emb100k, qv100k, k=10).count(),
    )
    allow100k = emb100k.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    stage(
        "filtered_100k_5q",
        lambda: cosine_topk_bruteforce(
            emb100k, qv100k, k=10, allow=allow100k
        ).count(),
    )

    # DV update benchmarked on a hard-link SNAPSHOT of the shared index
    # (instant to take; keeps the tmpfs fixture immutable for others).
    import shutil
    import tempfile

    from dts.docvalues import update_doc_values
    from dts.snapshot import snapshot_index

    ups = spark.range(10_000).select(
        (F.col("id") * 48 % 480000).alias("doc_id"),
        (F.col("id") % 4096).cast("long").alias("n_chars"),
    )

    def _dv_update():
        snap = tempfile.mkdtemp(prefix="dts_dvu_snap_")
        shutil.rmtree(snap)
        snapshot_index(dv_idx, snap)
        update_doc_values(spark, snap, ups, ["n_chars"])
        shutil.rmtree(snap)

    stage("dv_update_10k", _dv_update, reps=1)

    from dts.textstats import pii_scrub

    stage(
        "pii_scrub_480k",
        lambda: pii_scrub(docs, text_col="content")
        .agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone"))
        .collect(),
    )

    from dts.analysis import en_light_analyze_col

    stage(
        "analyze_480k",
        lambda: docs.select(
            F.sum(F.length(en_light_analyze_col("content")))
        ).collect(),
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
