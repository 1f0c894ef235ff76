"""Round-5 session-6 surface walls at 480k docs / 100k vectors (tmpfs,
local[8], warm best-of-2). Evidence the newest surfaces hold at ~100×
the pytest corpus:

- Gopher repetition filters (one codegen map pass — should be scan-bound);
- exact-substring span removal (fast Rabin-Karp path; the md5 spec's
  cost class was already measured by the winnowing A/B: ~50× slower);
- range / calendar date_histogram / filters aggregations (corpus-wide,
  one scan + hash agg each);
- PQ encode + PQ ADC search + IVF-PQ at 100k×64 synthetic vectors
  (same md5-derived vectors as round-4's ivf_100k_5q stage);
- cross_fields over a 480k two-field index (content + path).

Usage: python scripts/round5d_ops_bench.py [--corpus DIR] [--base DIR]
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
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("r5dops", master="local[8]", shuffle_partitions=16)
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

    from dts.dedup import remove_duplicate_ngrams
    from dts.facet import facet_date_histogram, facet_filters, facet_range
    from dts.textstats import gopher_repetition

    docs = corpus.select("doc_id", F.col("content").alias("text"), "lang")

    # impl="expr" (the oracle spec) measured 180.71 s on this corpus —
    # the per-gram string building × 5 n-values is the winnowing-md5
    # cost class; the numpy fast path is the production stage.
    stage(
        "gopher_fast_480k",
        lambda: gopher_repetition(docs, impl="fast").agg(
            F.sum("dup_5gram_char_frac6")
        ).collect(),
    )
    stage(
        "dedup_spans_fast_480k",
        lambda: remove_duplicate_ngrams(docs, k=20, hash="fast").agg(
            F.sum("n_removed")
        ).collect(),
    )
    nchars = docs.select("doc_id", F.length("text").alias("n_chars"), "lang")
    stage(
        "facet_range_480k",
        lambda: facet_range(
            None, nchars, "n_chars",
            [("s", None, 200.0), ("m", 200.0, 800.0), ("l", 800.0, None)],
        ).collect(),
    )
    ev = docs.select(
        "doc_id",
        F.expr(
            "timestamp('2024-01-01') + make_interval(0, 0, 0, 0, 0, 0, "
            "doc_id % 7776000)"
        ).alias("ts"),
    )
    stage(
        "date_histogram_480k",
        lambda: facet_date_histogram(None, ev, "ts", "week").collect(),
    )
    stage(
        "facet_filters_480k",
        lambda: facet_filters(
            None, nchars,
            {"short": "n_chars < 300", "py": "lang = 'python'",
             "long_go": "n_chars > 900 AND lang = 'go'"},
        ).collect(),
    )

    # ---- vectors: same md5-derived 100k×64 set as round-4 ivf_100k_5q
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
    from dts.similarity import (
        _ivf_centroids,
        _as_double,
        ivfpq_encode,
        ivfpq_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    import numpy as np

    cb = pq_train(emb, m=16, ksub=256, seed="bench")
    enc_path = f"{args.base}/pq_enc_100k"
    if args.only is None or "pq_encode_100k" in args.only or not os.path.exists(enc_path):
        stage(
            "pq_encode_100k",
            lambda: pq_encode(emb, cb).write.mode("overwrite").parquet(enc_path),
            reps=1,
        )
    enc = spark.read.parquet(enc_path)
    stage("pq_topk_100k_5q", lambda: pq_topk(enc, qv, cb, k=10, rerank=100).count())

    e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
    rows = _ivf_centroids(e0, 64, "bench").collect()
    cids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cmat = np.array([r["c"] for r in rows], dtype=np.float64)
    ivfpq_path = f"{args.base}/ivfpq_enc_100k"
    if args.only is None or "ivfpq_encode_100k" in args.only or not os.path.exists(ivfpq_path):
        stage(
            "ivfpq_encode_100k",
            lambda: ivfpq_encode(emb, cb, cids, cmat)
            .write.mode("overwrite").parquet(ivfpq_path),
            reps=1,
        )
    ienc = spark.read.parquet(ivfpq_path)
    stage(
        "ivfpq_100k_5q",
        lambda: ivfpq_topk(
            ienc, qv, cb, nprobe=8, k=10, rerank=100, cents=(cids, cmat)
        ).count(),
    )

    # ---- cross_fields over a 480k two-field (content, path) index
    from dts.multifield import build_multifield_index, cross_fields_topk

    mf_dir = f"{args.base}/mf_480k_cf"
    if not os.path.exists(f"{mf_dir}/multifield.json"):
        t0 = time.perf_counter()
        build_multifield_index(
            spark,
            corpus.select("doc_id", F.col("content").alias("text"), "path"),
            mf_dir, {"text": 1.0, "path": 2.0}, bucket_size=4096,
        )
        out["prep_build_mf"] = round(time.perf_counter() - t0, 2)
        print(f"# prep_build_mf: {out['prep_build_mf']}", file=sys.stderr, flush=True)
    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{mf_dir}/field=text/term_stats")
        .orderBy(F.desc("df"), "term").limit(400).collect()
    ]
    q8 = spark.createDataFrame(
        [(i, f"{vocab[(i * 13) % 390]} {vocab[(i * 13 + 5) % 390]}") for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "cross_fields_480k_8q",
        lambda: cross_fields_topk(spark, mf_dir, q8, k=10, tie_breaker=0.3).count(),
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
