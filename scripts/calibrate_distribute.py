"""Calibrate the query-vs-bucket distribution crossover (ROADMAP item).

Measures bm25_topk_indexed wall time for both distribute modes across a
batch-size ladder on a prebuilt index, warm best-of-2 per cell, one JVM.

Usage:
  python scripts/calibrate_distribute.py --index DIR [--cpus 8]
         [--batches 1,4,16,60,240,960]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--batches", default="1,4,16,60,240,960")
    args = ap.parse_args()

    from dts.corpus import make_queries
    from dts.score_index import bm25_topk_indexed, load_index
    from dts.session import get_spark

    spark = get_spark(
        f"dts-calib-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    meta = load_index(spark, args.index)["meta"]
    n_buckets = -(-meta["n_docs"] // meta["bucket_size"])
    out = {
        "cpus": args.cpus,
        "n_docs": meta["n_docs"],
        "n_buckets": n_buckets,
        "cells": [],
    }
    qpd = make_queries(n_queries=1024, seed=42)
    for nq in (int(x) for x in args.batches.split(",")):
        queries = spark.createDataFrame(
            qpd.head(nq)[["query_id", "text", "fuzzy_k"]]
        )
        row = {"n_queries": nq}
        for mode in ("query", "bucket"):
            walls = []
            for rep in range(3):  # first is warm-up
                t0 = time.perf_counter()
                n = bm25_topk_indexed(
                    spark, args.index, queries, k=10, distribute=mode
                ).count()
                walls.append(time.perf_counter() - t0)
            row[mode] = round(min(walls[1:]), 3)
            row[f"{mode}_rows"] = n
        row["bucket_speedup"] = round(row["query"] / row["bucket"], 2)
        out["cells"].append(row)
        print(json.dumps(row), file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
