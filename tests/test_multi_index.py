"""Multi-index (MultiReader) search: two half-indexes searched together
must BIT-match one index over the whole corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dts.index_build import build_index
from dts.multi_index import multi_index_topk
from dts.score_index import bm25_topk_indexed


@pytest.fixture(scope="module")
def halves(spark, docs_sdf, tmp_path_factory):
    base = tmp_path_factory.mktemp("mi")
    d_full, d_a, d_b = (str(base / n) for n in ("full", "a", "b"))
    half_a = docs_sdf.filter(F.col("doc_id") % 2 == 0)
    half_b = docs_sdf.filter(F.col("doc_id") % 2 == 1)
    build_index(spark, docs_sdf, d_full, bucket_size=64, block_size=16)
    # different bucket sizes on purpose: geometry must not matter
    build_index(spark, half_a, d_a, bucket_size=32, block_size=16)
    build_index(spark, half_b, d_b, bucket_size=64, block_size=8)
    return d_full, d_a, d_b


def test_multi_index_equals_single(spark, halves, queries_pd):
    d_full, d_a, d_b = halves
    q = spark.createDataFrame(queries_pd.iloc[:5][["query_id", "text"]])
    want = (
        bm25_topk_indexed(spark, d_full, q, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        multi_index_topk(spark, [d_a, d_b], q, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["rank"]) == list(want["rank"])
    assert np.allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
    )


def test_multi_index_single_dir_matches_plain(spark, halves, queries_pd):
    d_full, _, _ = halves
    q = spark.createDataFrame(queries_pd.iloc[:3][["query_id", "text"]])
    want = bm25_topk_indexed(spark, d_full, q, k=8).toPandas()
    got = multi_index_topk(spark, [d_full], q, k=8).toPandas()
    key = ["query_id", "rank"]
    w = want.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert list(g["doc_id"]) == list(w["doc_id"])
    assert np.array_equal(g["score"].to_numpy(), w["score"].to_numpy())


def test_multi_index_doc_bases(spark, halves, queries_pd):
    """Overlapping local ids disambiguate through doc_bases offsets."""
    _, d_a, d_b = halves
    q = spark.createDataFrame(queries_pd.iloc[:2][["query_id", "text"]])
    base = 10**6
    got = multi_index_topk(
        spark, [d_a, d_b], q, k=10, doc_bases=[0, base]
    ).toPandas()
    plain = multi_index_topk(spark, [d_a, d_b], q, k=10).toPandas()
    # offset ids: every hit from index b shifts by base; scores unchanged
    assert set(got["doc_id"]) == {
        d + base if d % 2 == 1 else d for d in plain["doc_id"]
    }
    with pytest.raises(ValueError, match="doc_bases"):
        multi_index_topk(spark, [d_a, d_b], q, doc_bases=[0]).collect()


# --- rescore window (dts.rescore) ---------------------------------------


@pytest.fixture(scope="module")
def pos_idx(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rs_idx"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16, positions=True)
    return d


def _rescore_replay(oracle, corpus_pd, text, k, window, qw, rw, mode):
    from dts.oracle import phrase_bm25_score, phrase_count
    from dts.tokenizer import tokenize_text

    primary = oracle.score_query(text, topk=window)  # (rank, doc_id, score)
    terms = tokenize_text(text)
    texts = dict(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    cnts = {
        d: phrase_count(texts[d], terms)
        for _, d, _ in primary
    }
    df = sum(
        1 for t in texts.values() if phrase_count(t, terms) > 0
    )
    out = []
    for _, d, s in primary:
        ps = (
            phrase_bm25_score(oracle.n_docs, oracle.avgdl, df, cnts[d], oracle.doc_len[d])
            if cnts[d] > 0
            else None
        )
        if mode == "total":
            c = qw * s + rw * (ps or 0.0)
        else:
            c = s * (rw * ps if ps is not None else 1.0)
        out.append((d, c))
    out.sort(key=lambda x: (-round(x[1], 9), x[0]))
    return out[:k]


def test_rescore_vs_replay(spark, pos_idx, corpus_pd, queries_pd):
    from dts.oracle import OracleIndex
    from dts.rescore import rescore_topk
    from dts.tokenizer import tokenize_text

    oracle = OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )
    t = tokenize_text(corpus_pd["content"].iloc[0])
    texts = [f"{t[0]} {t[1]}", f"{t[2]} {t[3]}"]
    q = spark.createDataFrame(
        list(enumerate(texts)), "query_id long, text string"
    )
    for mode, qw, rw in [("total", 1.0, 2.0), ("multiply", 1.0, 0.5)]:
        got = (
            rescore_topk(
                spark, pos_idx, q, k=8, window=30,
                query_weight=qw, rescore_weight=rw, score_mode=mode,
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
        )
        for qid, text in enumerate(texts):
            want = _rescore_replay(oracle, corpus_pd, text, 8, 30, qw, rw, mode)
            g = got[got["query_id"] == qid]
            assert list(g["doc_id"].astype(int)) == [d for d, _ in want], (mode, qid)
            assert np.allclose(g["score"], [s for _, s in want], rtol=1e-9), (mode, qid)
    with pytest.raises(ValueError, match="window"):
        rescore_topk(spark, pos_idx, q, k=20, window=10).collect()


def test_index_boosts_reorder_merge(spark, halves, queries_pd):
    """ES indices_boost: boosting one index multiplies its legs' scores
    before the global merge; boost 1.0 everywhere == no boosts arg."""
    from dts.multi_index import multi_index_topk

    _, a, b = halves
    queries2 = spark.createDataFrame(queries_pd.iloc[:3][["query_id", "text"]])
    base = multi_index_topk(spark, [a, b], queries2, k=8).collect()
    same = multi_index_topk(
        spark, [a, b], queries2, k=8, index_boosts=[1.0, 1.0]
    ).collect()
    key = lambda rs: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rs
    )
    assert key(base) == key(same)

    boosted = multi_index_topk(
        spark, [a, b], queries2, k=8, index_boosts=[5.0, 1.0]
    ).collect()
    # index a holds the EVEN doc_ids: its scores scale 5×, odds are 1×
    base_scores = {
        (r["query_id"], r["doc_id"]): r["score"] for r in base
    }
    hit = 0
    for r in boosted:
        kd = (r["query_id"], r["doc_id"])
        if kd in base_scores:
            want = 5.0 if r["doc_id"] % 2 == 0 else 1.0
            assert abs(r["score"] / base_scores[kd] - want) < 1e-9
            hit += 1
    assert hit > 0

    import pytest as _pt

    with _pt.raises(ValueError, match="index_boosts"):
        multi_index_topk(spark, [a, b], queries2, index_boosts=[1.0])
