"""Round-6 480k-doc scale A/B harness (bench_extra-style; numbers cited in
OPTIMIZATION_r06.md).

Measures the round's changed operators on the regenerated 480k tmpfs
corpus (local[8], shuffle=16 — the BENCH/BASELINE.md harness shape) with
the noop sink (guide §1.4). Run against either tree:

    python scripts/r06_scale_bench.py /root/repo        # current
    python scripts/r06_scale_bench.py <r5-worktree>     # round-5 baseline

Corpus: dts.cli gen-corpus --n-docs 480000 → ingest → parquet at
/dev/shm/dts_bench/corpus_480000_ids.
"""

import sys, time, os
TREE = sys.argv[1]
sys.path.insert(0, TREE)
from pyspark.sql import functions as F
from dts.session import get_spark
spark = get_spark("s480", master="local[8]", shuffle_partitions=16)
spark.range(1000).select(F.sum("id")).collect()
corpus = spark.read.parquet("/dev/shm/dts_bench/corpus_480000_ids")
docs = corpus.select("doc_id", F.col("content").alias("text"))
docs.count()
def noop(df): df.write.format("noop").mode("overwrite").save()
def t(name, fn, reps=2):
    best=1e9
    for _ in range(reps):
        t0=time.perf_counter(); fn(); best=min(best,time.perf_counter()-t0)
    print("T", name, round(best,2), flush=True)

from dts.phrasesuggest import bigram_counts
from dts.lmscore import doc_lm_perplexity, unigram_counts
from dts.dedup import minhash_signatures, winnow_col, remove_duplicate_ngrams
from dts.textstats import gopher_repetition, gopher_quality, fingerprints
t("bigrams_480k", lambda: noop(bigram_counts(docs)))
t("lm_ppl_480k", lambda: doc_lm_perplexity(docs, bigram_counts(docs), unigram_counts(docs)).agg(F.sum("ppl6")).collect(), reps=1)
t("minhash8_480k", lambda: noop(minhash_signatures(docs, n_hashes=8)))
t("winnow_expr_480k", lambda: noop(docs.select("doc_id", winnow_col("text", 6, 4).alias("f"))), reps=1)
t("rm_ngrams_md5_480k", lambda: noop(remove_duplicate_ngrams(docs, k=6, min_count=2)), reps=1)
t("fingerprints_480k", lambda: noop(fingerprints(docs)))
t("gopher_rep_expr_480k", lambda: noop(gopher_repetition(docs)), reps=1)
try:
    t("gopher_q_expr_480k", lambda: noop(gopher_quality(docs)))
    t("gopher_q_fast_480k", lambda: noop(gopher_quality(docs, impl="fast")))
except TypeError:
    t("gopher_q_expr_480k", lambda: noop(gopher_quality(docs)))
# geo at 480k: synthetic coords from doc_id (probe shape)
g = docs.select("doc_id",
    ((F.col("doc_id")*37 % 17000)/100.0 - 85.0).alias("lat"),
    ((F.col("doc_id")*73 % 36000)/100.0 - 180.0).alias("lon"))
from dts.geo import geo_distance_topk
t("geo_topk_480k", lambda: geo_distance_topk(g, "lat", "lon", 10.0, 20.0, k=100).count())
spark.stop()
