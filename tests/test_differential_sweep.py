"""Multi-seed randomized differential sweep — the reference's own test
methodology (src/test_generation.py samples N random instances, runs the
engine and the sequential oracle on identical inputs, and demands exact
equality; first mismatch fails). Here: fresh corpora and query sets per
seed through the FULL persisted-index engine vs the oracle."""

from __future__ import annotations

import math

import pytest

from dts.corpus import make_corpus, make_queries
from dts.index_build import build_index
from dts.oracle import OracleIndex
from dts.score_index import bm25_topk_indexed, match_counts_indexed
from dts.tokenizer import tokenize_text


@pytest.mark.parametrize("seed", [7, 1234, 999])
def test_random_instance_rank_identity(spark, tmp_path, seed):
    corpus = make_corpus(n_docs=120, seed=seed)
    corpus = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    corpus["doc_id"] = corpus.index.astype("int64")
    queries = make_queries(n_queries=15, seed=seed)

    docs_sdf = spark.createDataFrame(corpus)
    idx = str(tmp_path / f"idx_{seed}")
    build_index(spark, docs_sdf, idx, bucket_size=48, block_size=8)

    oracle = OracleIndex(list(zip(corpus["doc_id"], corpus["content"])))
    q_sdf = spark.createDataFrame(queries[["query_id", "text", "fuzzy_k"]])

    got = bm25_topk_indexed(spark, idx, q_sdf, k=10).collect()
    want = {}
    for q in queries.itertuples():
        for rank, doc_id, score in oracle.score_query(q.text, int(q.fuzzy_k), 10):
            want[(q.query_id, rank)] = (doc_id, score)
    assert {(r["query_id"], r["rank"]) for r in got} == set(want), f"seed {seed}"
    for r in got:
        doc_id, score = want[(r["query_id"], r["rank"])]
        assert r["doc_id"] == doc_id, (seed, r)
        assert r["score"] == score, (seed, "bit identity", r["score"], score)

    # Exact integer equality of the match-count vector (the reference's
    # acceptance criterion, src/test_generation.py:170-178).
    counts = {
        r["query_id"]: r["n_matches"]
        for r in match_counts_indexed(spark, idx, q_sdf).collect()
    }
    for q in queries.itertuples():
        expect = sum(
            sum(oracle.match_counts(t, int(q.fuzzy_k)).values())
            for t in tokenize_text(q.text)
        )
        assert counts[q.query_id] == expect, (seed, q.query_id)
