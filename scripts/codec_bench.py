"""varint vs packed (FOR bit-packing) codec A/B — size + speed.

Round-2 lesson (BENCH/BASELINE.md): ambient drift on this host exceeds
small effects, so the two codecs are INTERLEAVED in time inside one Spark
session (build A, build B, build A, build B; then query A/B/A/B) and each
side takes its best-of-2. Reports:

- postings directory bytes (the payload the codec owns)
- index build wall (encode cost)
- BM25 query batch wall (decode cost dominates the scoring group)

Usage: python scripts/codec_bench.py [--corpus DIR] [--cpus 8] [--docs N]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fns in os.walk(d)
        for f in fns
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/dev/shm/dts_bench/corpus_480000_ids")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--queries", type=int, default=120)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--workdir", default="/dev/shm/dts_codec_ab")
    args = ap.parse_args()

    from dts.corpus import make_queries
    from dts.index_build import build_index
    from dts.score_index import bm25_topk_indexed, load_index
    from dts.session import get_spark

    spark = get_spark(
        "dts-codec-ab", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    docs = spark.read.parquet(args.corpus)
    n_docs = docs.count()
    os.makedirs(args.workdir, exist_ok=True)
    idx = {c: f"{args.workdir}/idx_{c}" for c in ("varint", "packed")}

    # warm both paths once (JIT, python workers)
    for c in idx:
        build_index(spark, docs, idx[c] + "_warm", bucket_size=4096, codec=c)

    build = {c: float("inf") for c in idx}
    for _ in range(args.rounds):
        for c in idx:  # interleaved
            t0 = time.perf_counter()
            build_index(spark, docs, idx[c], bucket_size=4096, codec=c)
            build[c] = min(build[c], time.perf_counter() - t0)

    size = {c: dir_bytes(f"{idx[c]}/postings") for c in idx}

    qpd = make_queries(n_queries=args.queries, seed=42)
    queries = spark.createDataFrame(qpd[["query_id", "text", "fuzzy_k"]])
    for c in idx:  # warm
        bm25_topk_indexed(spark, idx[c], queries, k=10).count()
    query = {c: float("inf") for c in idx}
    rows = {}
    for _ in range(args.rounds + 1):
        for c in idx:  # interleaved
            t0 = time.perf_counter()
            rows[c] = bm25_topk_indexed(spark, idx[c], queries, k=10).count()
            query[c] = min(query[c], time.perf_counter() - t0)
    assert rows["varint"] == rows["packed"], rows  # same results, only bytes differ

    out = {
        "n_docs": int(n_docs),
        "cpus": args.cpus,
        "n_queries": args.queries,
        "postings_bytes": size,
        "bytes_ratio_packed_vs_varint": round(size["packed"] / size["varint"], 4),
        "build_wall_sec": {c: round(v, 2) for c, v in build.items()},
        "query_wall_sec": {c: round(v, 2) for c, v in query.items()},
        "result_rows": rows["varint"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
