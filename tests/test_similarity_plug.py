"""Pluggable similarity (dts.score classic_weight/classic_impact +
score_index similarity=): Lucene ClassicSimilarity over the same index
that serves BM25, exact vs a single-process python reference."""

from __future__ import annotations

import collections
import math

import numpy as np
import pytest

from dts.index_build import build_index
from dts.score_index import bm25_topk_indexed
from dts.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def cls_idx(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cls") / "idx")
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    return d


def _classic_ref(corpus_pd, qterms, k=10):
    toks = {
        int(r.doc_id): tokenize_text(r.content)
        for r in corpus_pd.itertuples()
    }
    n = len(toks)
    df = collections.Counter()
    for ts in toks.values():
        df.update(set(ts))
    out = {}
    for did, ts in toks.items():
        c = collections.Counter(ts)
        s = 0.0
        for t in qterms:
            if c[t]:
                s += (
                    (1.0 + math.log(n / (df[t] + 1.0))) ** 2
                    * math.sqrt(c[t])
                    / math.sqrt(len(ts))
                )
        if s:
            out[did] = s
    return sorted(out.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:k]


@pytest.mark.parametrize("distribute", ["query", "bucket"])
def test_classic_matches_reference(spark, cls_idx, corpus_pd, distribute):
    text = " ".join(tokenize_text(corpus_pd["content"].iloc[0])[:3])
    q = spark.createDataFrame(
        [(0, text, 0)], "query_id long, text string, fuzzy_k int"
    )
    got = (
        bm25_topk_indexed(
            spark, cls_idx, q, k=10, similarity="classic",
            distribute=distribute,
        )
        .toPandas()
        .sort_values("rank")
    )
    want = _classic_ref(corpus_pd, text.split())
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert np.allclose(list(got["score"]), [s for _, s in want])


def test_classic_differs_from_bm25_scores(spark, cls_idx, corpus_pd):
    text = " ".join(tokenize_text(corpus_pd["content"].iloc[0])[:3])
    q = spark.createDataFrame(
        [(0, text, 0)], "query_id long, text string, fuzzy_k int"
    )
    a = bm25_topk_indexed(spark, cls_idx, q, k=5).toPandas()
    b = bm25_topk_indexed(
        spark, cls_idx, q, k=5, similarity="classic"
    ).toPandas()
    assert list(a["score"]) != list(b["score"])


def test_classic_rejects_bmw_and_unknown(spark, cls_idx):
    q = spark.createDataFrame(
        [(0, "fast", 0)], "query_id long, text string, fuzzy_k int"
    )
    with pytest.raises(ValueError, match="bmw"):
        bm25_topk_indexed(
            spark, cls_idx, q, similarity="classic", strategy="bmw"
        ).count()
    with pytest.raises(ValueError, match="unknown similarity"):
        bm25_topk_indexed(spark, cls_idx, q, similarity="dfr").count()
