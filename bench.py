"""Benchmark harness: engine headline numbers at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric", "value" (total sec), "unit": "sec",
"queries": {stage: sec}, "sf"}. Stages:
  index_build      build the persisted compressed index over documents
  bm25_batch120    120-query BM25 top-10 batch (exact + fuzzy), TAAT
  bm25_bmw40       40-query batch through block-max WAND
  match_counts     reference-faithful per-query match-count vector
  dedup_suite      exact + minhash-band dedup over documents
  ann_topk         brute-force cosine top-10, 5 queries over embeddings
  text_analysis    token stats + quality + language id
  index_build_pos  positional index build (positions=True) — round 2
  phrase_batch40   40 exact-phrase queries over the positional index
  byte_match8      byte-window approx counting, 8 patterns (prefix trunc)
  boolean_batch20  20 MUST/MUST_NOT conjunctive queries — round 3
  wildcard_batch20 20 prefix-pattern BM25 rewrites (range expansion)
  snippet_batch8   8-pattern first-occurrence snippet scan
  filtered_batch40 40 queries through a 1/3-corpus filter context — round 4
  mlt_batch8       8-seed more-like-this (term vectors from postings)
  suggest_batch8   8 misspelled inputs → did-you-mean ranking
  parser_phrase8   8 fused query strings with quoted phrases — round 5
  phrase_scored8   same batch, Lucene PhraseQuery-scored phrases
  mf_build         2-field multifield index build (text + source)
  search_fields16  16 field-scoped query strings (fused one-pass kernel)
  span_near8       8 ordered span-near queries (total-span budget)
  synonym_batch8   8 queries with blended SynonymQuery clauses
  rescore8         8-query phrase-rescored window (top-50 → top-10)
  sig_terms8       significant_terms over 8 top-100 hit sets — round 5 late
  lmd_batch8       8-query LM Dirichlet scoring (cf-aware kernel plug)
  pii_scrub_docs   corpus-wide PII redaction counts (one codegen pass)
  combined_fields8 8-query BM25F (combined_fields) over the 2-field index — session 7
  intervals8       8 unordered max_gaps interval queries (anchor-cover sweep)
  match_bool_prefix8 8 search-as-you-type queries (capped prefix expansion)
  lm_ppl_docs      CCNet bigram-LM perplexity of every doc (self-LM)
  delete_compact   tombstone 1% of docs + compaction re-encode

The N-vs-4N scaling evidence lives in scripts/scaling_bench.py → BENCH/.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import functions as F

from dts.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("dts-bench")

    from dts.corpus import make_queries
    from dts.dedup import exact_canonical, minhash_signatures
    from dts.index_build import build_index
    from dts.io import driver_documents_as_source
    from dts.score_index import bm25_topk_indexed, match_counts_indexed
    from dts.similarity import cosine_topk_bruteforce
    from dts.textstats import language_id, quality_scores, token_counts

    timings: dict[str, float] = {}

    def stage(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 4)

    # Warm the JVM/Python workers (session init otherwise lands on stage 1).
    spark.range(1000).select(F.sum("id")).collect()

    docs = driver_documents_as_source(spark, sf_dir).cache()
    n_docs = docs.count()
    idx_dir = tempfile.mkdtemp(prefix="dts_bench_idx_")

    stage("index_build", lambda: build_index(spark, docs, idx_dir, bucket_size=2048))

    # Query terms drawn from the actual documents vocabulary (deterministic).
    vocab = [
        r["term"]
        for r in spark.read.parquet(f"{idx_dir}/term_stats")
        .orderBy(F.desc("df"), "term")
        .limit(400)
        .collect()
    ]
    qrows = []
    for i in range(120):
        terms = [vocab[(i * 7 + j) % len(vocab)] for j in range(1 + i % 3)]
        fuzzy_k = [0, 0, 1, 0, 2, 0][i % 6]
        if fuzzy_k:
            terms[0] = terms[0][:-1] + "x" if len(terms[0]) > 3 else terms[0] + "x"
        qrows.append((i, " ".join(terms), fuzzy_k))
    queries = spark.createDataFrame(qrows, "query_id long, text string, fuzzy_k int")

    stage(
        "bm25_batch120",
        lambda: bm25_topk_indexed(spark, idx_dir, queries, k=10).count(),
    )
    stage(
        "bm25_bmw40",
        lambda: bm25_topk_indexed(
            spark, idx_dir, queries.filter(F.col("query_id") < 40), k=10,
            strategy="bmw",
        ).count(),
    )
    stage(
        "match_counts",
        lambda: match_counts_indexed(spark, idx_dir, queries).count(),
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stage(
        "dedup_suite",
        lambda: (
            exact_canonical(d).count(),
            minhash_signatures(d, n_hashes=8).count(),
        ),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    stage("ann_topk", lambda: cosine_topk_bruteforce(emb, qv, k=10).count())
    stage(
        "text_analysis",
        lambda: (
            token_counts(d).count(),
            quality_scores(d).count(),
            language_id(d).count(),
        ),
    )

    # Round-2 stages: positional index + phrase + byte-window counting.
    from dts.bytematch import byte_match_totals
    from dts.phrase import phrase_match_counts
    from dts.tokenizer import tokenize_text

    pos_idx_dir = tempfile.mkdtemp(prefix="dts_bench_posidx_")
    stage(
        "index_build_pos",
        lambda: build_index(
            spark, docs, pos_idx_dir, bucket_size=2048, positions=True
        ),
    )
    sample_texts = [
        r["content"]
        for r in docs.select("content").limit(40).collect()
    ]
    phrases = []
    for i, t in enumerate(sample_texts):
        toks = tokenize_text(t)
        if len(toks) >= 3:
            phrases.append((i, " ".join(toks[1:3])))
    ph = spark.createDataFrame(phrases, "phrase_id long, text string")
    stage(
        "phrase_batch40",
        lambda: phrase_match_counts(spark, pos_idx_dir, ph).count(),
    )
    pats = spark.createDataFrame(
        [(i, vocab[i * 13 % len(vocab)], i % 2) for i in range(8)],
        "pat_id long, pattern string, k int",
    )
    stage("byte_match8", lambda: byte_match_totals(d, pats).count())

    # Round-3 stages: boolean algebra, wildcard rewrite, snippets, and the
    # deletion lifecycle (tombstone 1% of docs + compaction re-encode).
    from dts.boolquery import boolean_match_docs
    from dts.delete import delete_docs
    from dts.index_build import compact_index
    from dts.snippet import snippet_matches
    from dts.wildcard import bm25_topk_wildcard

    bq = spark.createDataFrame(
        [
            (
                i,
                f"{vocab[(i * 11) % len(vocab)]} {vocab[(i * 17 + 1) % len(vocab)]}",
                vocab[(i * 29 + 2) % len(vocab)] if i % 2 else "",
            )
            for i in range(20)
        ],
        "bq_id long, must string, must_not string",
    )
    stage(
        "boolean_batch20",
        lambda: boolean_match_docs(spark, idx_dir, bq).count(),
    )
    wq = spark.createDataFrame(
        [(i, vocab[(i * 13) % len(vocab)][:3] + "*") for i in range(20)],
        "wq_id long, pattern string",
    )
    stage(
        "wildcard_batch20",
        lambda: bm25_topk_wildcard(spark, idx_dir, wq, k=10).count(),
    )
    spat = spark.createDataFrame(
        [(i, vocab[(i * 31) % len(vocab)]) for i in range(8)],
        "pat_id long, pattern string",
    )
    stage(
        "snippet_batch8",
        lambda: snippet_matches(docs, spat).count(),
    )

    # Round-4 stages: filter context, more-like-this, did-you-mean.
    from dts.mlt import more_like_this
    from dts.suggest import suggest_terms

    flt = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    stage(
        "filtered_batch40",
        lambda: bm25_topk_indexed(
            spark, idx_dir, queries.filter(F.col("query_id") < 40), k=10,
            doc_filter=flt,
        ).count(),
    )
    mlt_seeds = [int(100 * i + 7) for i in range(8)]
    stage(
        "mlt_batch8",
        lambda: more_like_this(spark, idx_dir, mlt_seeds, k=10).count(),
    )
    sug = [vocab[i * 17 % len(vocab)][:-1] + "x" for i in range(8)]
    stage(
        "suggest_batch8",
        lambda: suggest_terms(spark, idx_dir, sug, max_k=2, n=5).count(),
    )

    # Round-5 stages: fused phrase batches through the query-string parser
    # (filter + PhraseQuery-scored modes — one positional job + one
    # scoring job per batch), and the unified multifield grammar over a
    # 2-field index (fused one-pass kernel).
    from dts.multifield import build_multifield_index
    from dts.parser import search_batch, search_fields

    phrase_qs = [
        f'{vocab[(i * 7) % len(vocab)]} +{vocab[(i * 7 + 1) % len(vocab)]} '
        f'"{phrases[i % len(phrases)][1]}"'
        for i in range(8)
    ]
    stage(
        "parser_phrase8",
        lambda: search_batch(spark, pos_idx_dir, phrase_qs, k=10).count(),
    )
    stage(
        "phrase_scored8",
        lambda: search_batch(
            spark, pos_idx_dir, phrase_qs, k=10, phrase_mode="scored"
        ).count(),
    )
    mf_dir = tempfile.mkdtemp(prefix="dts_bench_mf_")
    stage(
        "mf_build",
        lambda: build_multifield_index(
            spark,
            d.select("doc_id", F.col("text"), "source"),
            mf_dir,
            {"text": 1.0, "source": 0.5},
            bucket_size=2048,
        ),
    )
    mf_qs = [
        f"source:src{i % 10} +{vocab[(i * 5) % len(vocab)]} "
        f"{vocab[(i * 13 + 1) % len(vocab)]}"
        for i in range(16)
    ]
    stage(
        "search_fields16",
        lambda: search_fields(
            spark, mf_dir, mf_qs, k=10, default_field="text"
        ).count(),
    )

    # Round-5 late stages: span queries, synonym blends, rescore window.
    from dts.rescore import rescore_topk
    from dts.spans import span_near_counts
    from dts.synonym import bm25_topk_synonyms

    span_qs = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 7) % len(vocab)]} {vocab[(i * 7 + 1) % len(vocab)]}", i % 4)
            for i in range(8)
        ],
        "sq_id long, text string, slop int",
    )
    stage(
        "span_near8",
        lambda: span_near_counts(spark, pos_idx_dir, span_qs).count(),
    )
    syn_map = {vocab[i]: [vocab[i + 1]] for i in range(0, 16, 2)}
    syn_qs = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 2) % 16]} {vocab[(i * 19 + 3) % len(vocab)]}")
            for i in range(8)
        ],
        "query_id long, text string",
    )
    stage(
        "synonym_batch8",
        lambda: bm25_topk_synonyms(
            spark, idx_dir, syn_qs, syn_map, k=10
        ).count(),
    )
    rs_qs = spark.createDataFrame(
        [(i, phrases[i % len(phrases)][1]) for i in range(8)],
        "query_id long, text string",
    )
    stage(
        "rescore8",
        lambda: rescore_topk(
            spark, pos_idx_dir, rs_qs, k=10, window=50
        ).count(),
    )

    agg_qs = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 7) % len(vocab)]} {vocab[(i * 7 + 1) % len(vocab)]}")
            for i in range(8)
        ],
        "query_id long, text string",
    )
    from dts.facet import significant_terms_indexed

    agg_matches = bm25_topk_indexed(spark, idx_dir, agg_qs, k=100)
    stage(
        "sig_terms8",
        lambda: significant_terms_indexed(
            spark, idx_dir, agg_matches, docs, key="query_id",
            text_col="content", size=10, min_doc_count=3,
        ).count(),
    )
    stage(
        "lmd_batch8",
        lambda: bm25_topk_indexed(
            spark, idx_dir, agg_qs, k=10, similarity="lmd"
        ).count(),
    )
    # Session-7 stages: BM25F, unordered intervals, search-as-you-type,
    # CCNet LM perplexity.
    from dts.lmscore import doc_lm_perplexity, unigram_counts
    from dts.multifield import combined_fields_topk
    from dts.phrasesuggest import bigram_counts
    from dts.spans import interval_unordered_counts
    from dts.wildcard import match_bool_prefix_topk

    stage(
        "combined_fields8",
        lambda: combined_fields_topk(spark, mf_dir, agg_qs, k=10).count(),
    )
    iq = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 7) % len(vocab)]} {vocab[(i * 7 + 11) % len(vocab)]}", 3)
            for i in range(8)
        ],
        "iq_id long, text string, max_gaps int",
    )
    stage(
        "intervals8",
        lambda: interval_unordered_counts(spark, pos_idx_dir, iq).count(),
    )
    mbp_qs = spark.createDataFrame(
        [
            (i, f"{vocab[(i * 3) % len(vocab)]} {vocab[(i * 3 + 1) % len(vocab)][:2]}")
            for i in range(8)
        ],
        "query_id long, text string",
    )
    stage(
        "match_bool_prefix8",
        lambda: match_bool_prefix_topk(
            spark, idx_dir, mbp_qs, k=10, max_expansions=50
        ).count(),
    )
    stage(
        "lm_ppl_docs",
        lambda: doc_lm_perplexity(
            d, bigram_counts(d), unigram_counts(d)
        ).agg(F.sum("ppl6")).collect(),
    )

    from dts.textstats import pii_scrub

    stage(
        "pii_scrub_docs",
        lambda: pii_scrub(docs, text_col="content")
        .agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone"))
        .collect(),
    )

    def _delete_compact() -> None:
        delete_docs(
            spark, idx_dir,
            docs.filter(F.col("doc_id") % 100 == 7).select("doc_id"),
        )
        compact_index(spark, idx_dir)

    stage("delete_compact", _delete_compact)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "dts_engine_e2e",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_docs": n_docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
