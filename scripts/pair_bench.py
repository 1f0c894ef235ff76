"""Interleaved N/4N pair measurement (headline efficiency).

Shared-hardware drift makes sequentially-measured levels incomparable
(local[2] query walls observed from 79s to 114s across an afternoon on
the SAME input and code). This runner alternates the two levels across
repetitions — drift hits both equally — and takes the per-level minimum,
each repetition in its own JVM (same as scaling_bench levels).

Usage: python scripts/pair_bench.py --corpus DIR [--reps 2] [--queries 960]
Prints one JSON line with per-level minima and the N→4N efficiencies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaling_bench import PAIR, run_level_subprocess  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", type=int, default=960)
    args = ap.parse_args()

    best: dict[int, dict] = {}
    for rep in range(args.reps):
        for cpus in PAIR:
            r = run_level_subprocess(cpus, args.corpus, args.queries)
            print(f"rep{rep} local[{cpus}]: {json.dumps(r)}", file=sys.stderr)
            b = best.get(cpus)
            if b is None:
                best[cpus] = dict(r)
            else:
                b["build_wall_sec"] = min(b["build_wall_sec"], r["build_wall_sec"])
                b["query_wall_sec"] = min(b["query_wall_sec"], r["query_wall_sec"])
        # per-level derived throughputs from the minima
    for c, b in best.items():
        b["build_files_per_sec"] = round(b["n_docs"] / b["build_wall_sec"], 1)
        b["queries_per_sec"] = round(b["n_queries"] / b["query_wall_sec"], 2)
    lo, hi = best[PAIR[0]], best[PAIR[1]]
    factor = PAIR[1] / PAIR[0]
    out = {
        "pair": list(PAIR),
        "lo": lo,
        "hi": hi,
        "build_eff": round(hi["build_files_per_sec"] / (factor * lo["build_files_per_sec"]), 3),
        "query_eff": round(hi["queries_per_sec"] / (factor * lo["queries_per_sec"]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
