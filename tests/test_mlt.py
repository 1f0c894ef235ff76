"""More-like-this vs a python replay of the spec: term-vector
reconstruction from bucket-colocated postings, tf·idf term selection,
seed-excluded ranking."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dts.index_build import build_index
from dts.mlt import doc_term_vectors, more_like_this
from dts.oracle import OracleIndex, idf
from dts.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def mlt_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mlt_index"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    return d


@pytest.fixture(scope="module")
def oracle(corpus_pd) -> OracleIndex:
    return OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )


def _select_terms(oracle, doc_id, max_terms=25, min_df=2):
    from collections import Counter

    toks = Counter()
    for t, per_doc in oracle.tf.items():
        if doc_id in per_doc:
            toks[t] = per_doc[doc_id]
    scored = []
    for t, tf in toks.items():
        df = len(oracle.tf[t])
        if df < min_df:
            continue
        scored.append((t, tf * idf(oracle.n_docs, df)))
    scored.sort(key=lambda kv: (-round(kv[1], 9), kv[0]))
    return [t for t, _ in scored[:max_terms]]


def test_doc_term_vectors_match_tokenizer(spark, mlt_index, corpus_pd):
    seeds = [int(corpus_pd["doc_id"].iloc[i]) for i in (0, 7, 150)]
    got = {
        (int(r["doc_id"]), r["term"]): int(r["tf"])
        for r in doc_term_vectors(spark, mlt_index, seeds).collect()
    }
    for s in seeds:
        txt = corpus_pd.loc[corpus_pd["doc_id"] == s, "content"].iloc[0]
        from collections import Counter

        want = Counter(tokenize_text(txt))
        mine = {t: tf for (d, t), tf in got.items() if d == s}
        assert mine == dict(want), s


def test_more_like_this_vs_replay(spark, mlt_index, corpus_pd, oracle):
    seeds = [int(corpus_pd["doc_id"].iloc[i]) for i in (0, 5, 42)]
    got = more_like_this(spark, mlt_index, seeds, k=10).toPandas()
    assert not any(got["query_id"] == got["doc_id"])  # seed never in own results
    for s in seeds:
        terms = _select_terms(oracle, s)
        want = [
            (d, sc)
            for _, d, sc in oracle.score_terms(terms, topk=10**6)
            if d != s
        ][:10]
        g = got[got["query_id"] == s].sort_values("rank")
        assert list(g["doc_id"].astype(int)) == [d for d, _ in want], s
        for a, b in zip(g["score"], [sc for _, sc in want]):
            assert math.isclose(a, b, rel_tol=0, abs_tol=1e-9), s
        # ranks are dense 1..n after the seed drop
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_more_like_this_duplicate_seed_finds_twin(spark, mlt_index, corpus_pd):
    """The corpus contains byte-identical duplicate docs — each other's
    nearest neighbor by construction."""
    by_text: dict[str, list[int]] = {}
    for _, r in corpus_pd.iterrows():
        by_text.setdefault(r["content"], []).append(int(r["doc_id"]))
    twins = next(ids for txt, ids in by_text.items()
                 if len(ids) >= 2 and tokenize_text(txt))
    got = more_like_this(spark, mlt_index, [twins[0]], k=3).toPandas()
    top1 = int(got.sort_values("rank")["doc_id"].iloc[0])
    assert top1 in set(twins[1:]), (twins, top1)


def test_mlt_stored_term_vectors_identical(spark, corpus_pd, tmp_path):
    """An index WITH the term_vectors sidecar must produce bit-identical
    MLT output to one without (Lucene: stored vectors vs re-analysis are
    the same vector), and the sidecar read must equal the bucket-postings
    reconstruction row-for-row."""
    from dts.index_build import build_index
    from dts.mlt import doc_term_vectors, more_like_this
    from dts.termvectors import term_vectors

    docs = spark.createDataFrame(corpus_pd.head(120))
    a = str(tmp_path / "mlt_plain")
    b = str(tmp_path / "mlt_tv")
    build_index(spark, docs, a, bucket_size=32)
    build_index(spark, docs, b, bucket_size=32, store_term_vectors=True)
    seeds = [1, 17, 63]
    rec = {
        (int(r["doc_id"]), r["term"]): int(r["tf"])
        for r in doc_term_vectors(spark, a, seeds).collect()
    }
    sid = {
        (int(r["doc_id"]), r["term"]): int(r["tf"])
        for r in term_vectors(spark, b, doc_ids=seeds).collect()
    }
    assert rec == sid
    key = lambda df: sorted(  # noqa: E731
        (int(r["query_id"]), int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 9))
        for r in df.collect()
    )
    assert key(more_like_this(spark, a, seeds, k=5)) == key(
        more_like_this(spark, b, seeds, k=5)
    )
