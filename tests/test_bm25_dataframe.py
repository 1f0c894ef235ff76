"""Rank-identity of the pure-DataFrame BM25 path vs the oracle.

Mirrors the reference's differential test (src/test_generation.py:170-178:
exact equality of per-pattern results between the parallel engine and the
sequential apm1 oracle) — here: identical (query_id, rank, doc_id) and
scores equal to 1e-9 relative tolerance.
"""

from __future__ import annotations

import math

from dts.oracle import OracleIndex
from dts.score import bm25_topk_dataframe


def test_rank_identity_exact_queries(spark, corpus_pd, queries_pd, docs_sdf):
    exact = queries_pd[queries_pd["fuzzy_k"] == 0].reset_index(drop=True)
    queries_sdf = spark.createDataFrame(exact[["query_id", "text"]])

    got = (
        bm25_topk_dataframe(docs_sdf, queries_sdf, k=10)
        .orderBy("query_id", "rank")
        .collect()
    )

    oracle = OracleIndex(list(zip(corpus_pd["doc_id"], corpus_pd["content"])))
    want = {}
    for _, q in exact.iterrows():
        for rank, doc_id, score in oracle.score_query(q["text"], 0, 10):
            want[(q["query_id"], rank)] = (doc_id, score)

    got_keys = {(r["query_id"], r["rank"]) for r in got}
    assert got_keys == set(want), "top-k membership differs from oracle"
    for r in got:
        doc_id, score = want[(r["query_id"], r["rank"])]
        assert r["doc_id"] == doc_id, (
            f"rank mismatch q={r['query_id']} rank={r['rank']}: "
            f"{r['doc_id']} != {doc_id}"
        )
        assert math.isclose(r["score"], score, rel_tol=1e-9), (
            r["query_id"], r["rank"], r["score"], score,
        )


def test_duplicate_docs_tie_break(spark, corpus_pd, docs_sdf):
    """The edge/dup pair is byte-identical content (mirrors dna/large/0==1):
    both must appear with adjacent ranks, lower doc_id first."""
    dup = corpus_pd[corpus_pd["repo"] == "edge/dup"]
    assert len(dup) == 2
    d0, d1 = sorted(dup["doc_id"])
    # Query a term guaranteed in the dup docs.
    queries_sdf = spark.createDataFrame([(0, "ident0 dup0")], "query_id long, text string")
    got = (
        bm25_topk_dataframe(docs_sdf, queries_sdf, k=500)
        .orderBy("rank")
        .collect()
    )
    ranks = {r["doc_id"]: r["rank"] for r in got}
    assert d0 in ranks and d1 in ranks
    scores = {r["doc_id"]: r["score"] for r in got}
    assert abs(scores[d0] - scores[d1]) < 1e-9
    assert ranks[d1] == ranks[d0] + 1, "doc_id ASC tie-break violated"


def test_empty_and_onebyte_docs(spark, docs_sdf, corpus_pd):
    """Mirrors dna/empty fixtures: empty docs never match; 1-char doc
    matches its own token."""
    queries_sdf = spark.createDataFrame([(0, "T")], "query_id long, text string")
    got = bm25_topk_dataframe(docs_sdf, queries_sdf, k=10).collect()
    one = corpus_pd[corpus_pd["repo"] == "edge/onebyte"]["doc_id"].iloc[0]
    assert [r["doc_id"] for r in got] == [one]
