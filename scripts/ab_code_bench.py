"""Old-vs-new CODE A/B at both parallelism levels, interleaved in time.

The round-2 protocol lesson: never compare against recorded numbers —
ambient drift exceeds code effects. This runner alternates
(codeA,2) (codeB,2) (codeA,8) (codeB,8) per rep, each in its own JVM via
that checkout's scripts/scaling_bench.py --one-level, and reports
per-(code,level) minima plus the derived efficiencies.

Usage: python scripts/ab_code_bench.py --a /tmp/dts_r2 --b /root/repo \
         --corpus /dev/shm/dts_bench/corpus_480000_ids [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_level(repo: str, cpus: int, corpus: str, queries: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, os.path.join(repo, "scripts", "scaling_bench.py"),
            "--one-level", str(cpus), "--corpus", corpus,
            "--queries", str(queries),
        ],
        check=True, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": repo},
        cwd=repo,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="checkout A (e.g. old code)")
    ap.add_argument("--b", required=True, help="checkout B (e.g. new code)")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", type=int, default=960)
    ap.add_argument("--levels", default="2,8")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    best: dict[tuple, dict] = {}
    for rep in range(args.reps):
        for cpus in levels:
            for tag, repo in (("A", args.a), ("B", args.b)):
                r = run_level(repo, cpus, args.corpus, args.queries)
                print(f"rep{rep} {tag} local[{cpus}]: {json.dumps(r)}", file=sys.stderr)
                k = (tag, cpus)
                if k not in best:
                    best[k] = dict(r)
                else:
                    for f in ("build_wall_sec", "query_wall_sec"):
                        best[k][f] = min(best[k][f], r[f])

    out = {"corpus": args.corpus, "queries": args.queries, "cells": {}}
    for (tag, cpus), r in best.items():
        out["cells"][f"{tag}_{cpus}"] = {
            "build_wall_sec": r["build_wall_sec"],
            "query_wall_sec": r["query_wall_sec"],
        }
    for tag in ("A", "B"):
        lo, hi = (best[(tag, levels[0])], best[(tag, levels[-1])])
        ratio = levels[-1] // levels[0]
        out[f"{tag}_build_eff"] = round(
            lo["build_wall_sec"] / (ratio * hi["build_wall_sec"]), 3
        )
        out[f"{tag}_query_eff"] = round(
            lo["query_wall_sec"] / (ratio * hi["query_wall_sec"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
