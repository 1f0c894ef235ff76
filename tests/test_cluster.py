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


def _cc_star(spark, edges, max_iter=25):
    from dts.cluster import connected_components_star

    pairs = spark.createDataFrame(edges, "a long, b long")
    return {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in connected_components_star(pairs, max_iter=max_iter).collect()
    }


def test_star_matches_label_on_basic_graphs(spark):
    """Round-4 large-star/small-star: identical clustering to min-label on
    chains, cliques and mixed graphs."""
    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        [(i, i + 1) for i in range(12)],
        [(5, 9), (9, 5), (7, 7), (1, 3)],  # dup edges + self-loop
    ]
    for edges in cases:
        assert _cc_star(spark, edges) == _cc(spark, edges), edges


def test_star_converges_on_adversarial_chain(spark):
    """The upgrade case: a 60-node chain needs O(n) min-label rounds
    (raises at max_iter=10) but O(log² n) star rounds (converges)."""
    edges = [(i, i + 1) for i in range(60)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=10)
    got = _cc_star(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(61)}


def test_star_random_graph_vs_union_find(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    edges = [
        (int(rng.randint(0, 80)), int(rng.randint(0, 80))) for _ in range(120)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    # python union-find reference
    parent = list(range(80))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {}
    for u, v in edges:
        for x in (u, v):
            want[x] = find(x)
    # canonical root = min of component
    comp: dict[int, list[int]] = {}
    for x, r in want.items():
        comp.setdefault(r, []).append(x)
    want = {x: min(members) for r, members in comp.items() for x in members}
    assert _cc_star(spark, edges) == want


def test_dup_clusters_star_equals_label(spark, docs_sdf):
    a = {
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in dup_clusters(
            docs_sdf, text_col="content", n=3, threshold=0.6
        ).collect()
    }
    b = {
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in dup_clusters(
            docs_sdf, text_col="content", n=3, threshold=0.6,
            algorithm="star",
        ).collect()
    }
    assert a == b and len(a) > 0


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
