"""Connected components / dup clustering vs hand-built graphs and a
python union-find replay on the real corpus."""

from __future__ import annotations

import pytest

from dts.cluster import connected_components, dup_clusters


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "a long, b long")
    return {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in connected_components(pairs).collect()
    }


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple rounds) + clique 10,11,12
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_max_iter_guard(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=2)


def test_dup_clusters_vs_union_find(spark, docs_sdf, corpus_pd):
    from dts.dedup import jaccard_pairs

    got = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in dup_clusters(
            docs_sdf, text_col="content", n=3, threshold=0.6
        ).collect()
    }
    edges = [
        (int(r["a"]), int(r["b"]))
        for r in jaccard_pairs(
            docs_sdf, text_col="content", n=3, threshold=0.6
        ).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want and len(got) > 0
