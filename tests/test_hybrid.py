"""RRF hybrid retrieval (dts.hybrid): fusion math vs a python reference,
determinism of the sorted-fold sum, and the end-to-end leg composition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dts.hybrid import hybrid_topk, rrf_fuse


def _fuse_ref(lists, k=10, rrf_k=60):
    """Single-process RRF: lists = [{query: [(doc, rank), ...]}]."""
    acc: dict[tuple[int, int], list[float]] = {}
    for lst in lists:
        for q, pairs in lst.items():
            for d, r in pairs:
                acc.setdefault((q, d), []).append(1.0 / (rrf_k + r))
    fused: dict[int, list[tuple[int, float]]] = {}
    for (q, d), cs in acc.items():
        s = 0.0
        for c in sorted(cs):
            s += c
        fused.setdefault(q, []).append((d, round(s, 6)))
    out = {}
    for q, rows in fused.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        out[q] = [
            (d, s, i + 1) for i, (d, s) in enumerate(rows[:k])
        ]
    return out


def _ranked_df(spark, lst):
    rows = [
        (q, d, r) for q, pairs in lst.items() for d, r in pairs
    ]
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


def test_rrf_two_lists_matches_reference(spark):
    a = {0: [(1, 1), (2, 2), (3, 3)], 1: [(7, 1), (8, 2)]}
    b = {0: [(2, 1), (9, 2)], 1: [(8, 1), (7, 2), (5, 3)]}
    got = {
        (r.query_id, r.doc_id): (r.rrf6, r.rank)
        for r in rrf_fuse([_ranked_df(spark, a), _ranked_df(spark, b)], k=10).collect()
    }
    ref = _fuse_ref([a, b])
    want = {
        (q, d): (s, r) for q, rows in ref.items() for d, s, r in rows
    }
    assert got == want


def test_rrf_three_lists_deterministic_fold(spark):
    """≥3 legs: doubles are not associative — the sorted fold must make
    the sum identical to the sorted python reference, repeatably."""
    lists = [
        {0: [(d, r + 1) for r, d in enumerate(range(20))]},
        {0: [(d, r + 1) for r, d in enumerate(range(19, -1, -1))]},
        {0: [(d, r + 1) for r, d in enumerate(range(0, 20, 2))]},
    ]
    dfs = [_ranked_df(spark, lst) for lst in lists]
    ref = _fuse_ref(lists, k=20)
    want = {(0, d): (s, r) for d, s, r in ref[0]}
    for _ in range(2):
        got = {
            (r.query_id, r.doc_id): (r.rrf6, r.rank)
            for r in rrf_fuse(dfs, k=20).collect()
        }
        assert got == want


def test_rrf_missing_doc_contributes_nothing(spark):
    a = {0: [(1, 1)]}
    b = {0: [(2, 1)]}
    got = rrf_fuse([_ranked_df(spark, a), _ranked_df(spark, b)], k=10)
    rows = {r.doc_id: r.rrf6 for r in got.collect()}
    assert rows == {1: round(1.0 / 61, 6), 2: round(1.0 / 61, 6)}


def test_rrf_empty_input_raises(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])


@pytest.fixture(scope="module")
def hyb_idx(spark, docs_sdf, tmp_path_factory):
    from dts.index_build import build_index

    d = str(tmp_path_factory.mktemp("hyb") / "idx")
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    return d


def _fake_embeddings(spark, n=200, dim=8):
    """Deterministic embeddings keyed like doc_id (hash-derived floats)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, {d}), j -> cast("
            "  (conv(substring(md5(concat(cast(id as string), ':', cast(j as string))), 1, 6), 16, 10) % 1000) / 500.0 - 1.0"
            " as double))".format(d=dim - 1)
        ).alias("embedding"),
    )


def test_hybrid_topk_composes_legs(spark, hyb_idx, docs_sdf):
    """End-to-end: fused output equals rrf_fuse applied to the two legs
    computed independently, and the text-only / vector-only extremes
    appear (a doc ranked #1 in both legs must be fused #1)."""
    from dts.score_index import bm25_topk_indexed
    from dts.similarity import cosine_topk_bruteforce

    q = spark.createDataFrame(
        [(0, "def return", 0), (1, "import", 0)],
        "query_id long, text string, fuzzy_k int",
    )
    emb = _fake_embeddings(spark)
    qvecs = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    fused = hybrid_topk(spark, hyb_idx, q, emb, qvecs, k=10, window=25)
    text = bm25_topk_indexed(spark, hyb_idx, q, k=25).select(
        "query_id", "doc_id", "rank"
    )
    vec = cosine_topk_bruteforce(
        emb, qvecs.select(F.col("query_id").alias("q_id"), "qvec"), k=25
    ).select(
        F.col("q_id").alias("query_id"), F.col("vec_id").alias("doc_id"), "rank"
    )
    manual = rrf_fuse([text, vec], k=10)
    got = sorted(map(tuple, fused.collect()))
    want = sorted(map(tuple, manual.collect()))
    assert got == want
    # each query emits a full page (both legs are ≥10 deep)
    by_q = {}
    for r in fused.collect():
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q_id, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, 11))


def test_hybrid_allow_filters_both_legs(spark, hyb_idx):
    q = spark.createDataFrame(
        [(0, "def return", 0)], "query_id long, text string, fuzzy_k int"
    )
    emb = _fake_embeddings(spark)
    qvecs = emb.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    allow = spark.range(0, 200, 2).select(F.col("id").alias("doc_id"))
    fused = hybrid_topk(
        spark, hyb_idx, q, emb, qvecs, k=10, window=25, allow=allow
    )
    ids = [r.doc_id for r in fused.collect()]
    assert ids and all(d % 2 == 0 for d in ids)
