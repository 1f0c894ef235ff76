"""Score explanations: per-clause rows vs the oracle formulas, and the
contribution sum vs the engine's own top-k score."""

from __future__ import annotations

import numpy as np
import pytest

from dts.explain import explain_scores
from dts.index_build import build_index
from dts.oracle import K1, B, OracleIndex, idf
from dts.score_index import bm25_topk_indexed
from dts.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def ex_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ex_index"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    return d


def test_explain_rows_and_sum(spark, ex_index, corpus_pd, queries_pd):
    oracle = OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )
    q = spark.createDataFrame(queries_pd.iloc[:3][["query_id", "text"]])
    top = bm25_topk_indexed(spark, ex_index, q, k=5).toPandas()
    doc_ids = {
        int(qid): [int(d) for d in g["doc_id"]]
        for qid, g in top.groupby("query_id")
    }
    got = explain_scores(spark, ex_index, q, doc_ids).toPandas()
    qtext = dict(zip(queries_pd["query_id"].astype(int), queries_pd["text"]))
    # per-row: exact Lucene-style factors
    for _, r in got.iterrows():
        t = r["term"]
        d = int(r["doc_id"])
        assert int(r["tf"]) == oracle.tf[t][d]
        assert int(r["dl"]) == oracle.doc_len[d]
        assert int(r["df"]) == len(oracle.tf[t])
        w = idf(oracle.n_docs, int(r["df"]))
        imp = (
            r["tf"] * (K1 + 1.0)
            / (r["tf"] + K1 * (1.0 - B + B * r["dl"] / oracle.avgdl))
        )
        assert np.isclose(r["contribution"], w * imp, rtol=1e-12)
    # clause structure: one row per matching (clause, doc); duplicate
    # tokens appear as separate clauses
    for qid, docs in doc_ids.items():
        toks = tokenize_text(qtext[qid])
        g = got[got["query_id"] == qid]
        for d in docs:
            gd = g[g["doc_id"] == d]
            expect = [
                ci for ci, t in enumerate(toks)
                if oracle.tf.get(t, {}).get(d)
            ]
            assert sorted(gd["clause"]) == expect, (qid, d)
    # sum of contributions == the engine's score for that doc
    for _, r in top.iterrows():
        s = got[
            (got["query_id"] == r["query_id"]) & (got["doc_id"] == r["doc_id"])
        ]["contribution"].sum()
        assert np.isclose(s, r["score"], rtol=1e-12)


def test_explain_empty_and_missing(spark, ex_index, queries_pd):
    q = spark.createDataFrame(queries_pd.iloc[:1][["query_id", "text"]])
    qid = int(queries_pd["query_id"].iloc[0])
    # a doc matching nothing yields no rows; empty targets yield none
    assert explain_scores(spark, ex_index, q, {qid: [10**9]}).count() == 0
    assert explain_scores(spark, ex_index, q, {}).count() == 0


@pytest.mark.parametrize("similarity", ["classic", "lmd"])
def test_explain_matches_kernel_other_similarities(
    spark, ex_index, corpus_pd, similarity
):
    """Lucene explain() works under any Similarity: the per-clause sums
    must equal bm25_topk_indexed(similarity=...) scores bit-for-bit."""
    from dts.explain import explain_scores
    from dts.score_index import bm25_topk_indexed
    from dts.tokenizer import tokenize_text

    text = " ".join(tokenize_text(corpus_pd["content"].iloc[0])[:3])
    q = spark.createDataFrame(
        [(0, text, 0)], "query_id long, text string, fuzzy_k int"
    )
    top = bm25_topk_indexed(
        spark, ex_index, q, k=5, similarity=similarity
    ).collect()
    want = {int(r["doc_id"]): float(r["score"]) for r in top}
    qx = spark.createDataFrame([(0, text)], "query_id long, text string")
    rows = explain_scores(
        spark, ex_index, qx, {0: list(want)}, similarity=similarity
    ).collect()
    got = {}
    for r in rows:
        got[int(r["doc_id"])] = got.get(int(r["doc_id"]), 0.0) + float(
            r["contribution"]
        )
    for d, s in want.items():
        assert abs(got.get(d, 0.0) - s) < 1e-12, (similarity, d)
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown similarity"):
        explain_scores(spark, ex_index, qx, {0: [1]}, similarity="dfr")
