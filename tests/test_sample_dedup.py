"""Deterministic sampling + end-to-end dedup policy (round 4): exact
membership vs a python md5 replay, layout independence, mixture knob;
dedup_corpus vs hand-computed survivors."""

from __future__ import annotations

import hashlib

import pytest

from dts.dedup import dedup_corpus
from dts.sample import hash_sample, stratified_hash_sample


def _py_u32(seed: str, key) -> int:
    return int(hashlib.md5(f"{seed}{key}".encode()).hexdigest()[:8], 16)


def test_hash_sample_exact_membership_and_layout_independence(spark, docs_sdf):
    frac, seed = 0.3, "t1"
    got = {
        int(r["doc_id"])
        for r in hash_sample(docs_sdf, frac, seed=seed).select("doc_id").collect()
    }
    all_ids = [int(r["doc_id"]) for r in docs_sdf.select("doc_id").collect()]
    want = {d for d in all_ids if _py_u32(seed, d) < int(frac * 2**32)}
    assert got == want
    # ~30% within statistical slack on ~200 docs
    assert 0.15 * len(all_ids) < len(got) < 0.45 * len(all_ids)
    # repartitioning must not change membership (the F.rand failure mode)
    got2 = {
        int(r["doc_id"])
        for r in hash_sample(docs_sdf.repartition(13), frac, seed=seed)
        .select("doc_id")
        .collect()
    }
    assert got2 == got
    # different seed ⇒ different (deterministic) sample
    got3 = {
        int(r["doc_id"])
        for r in hash_sample(docs_sdf, frac, seed="t2").select("doc_id").collect()
    }
    assert got3 != got


def test_hash_sample_bounds(spark, docs_sdf):
    n = docs_sdf.count()
    assert hash_sample(docs_sdf, 0.0).count() == 0
    assert hash_sample(docs_sdf, 1.0).count() == n
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs_sdf, 1.5)


def test_stratified_sample_mixture(spark, docs_sdf):
    """Per-lang fractions; unlisted strata get default_fraction."""
    fr = {"python": 1.0, "javascript": 0.0}
    out = stratified_hash_sample(
        docs_sdf, fr, stratum_col="lang", seed="t1", default_fraction=0.5
    )
    rows = out.select("doc_id", "lang").collect()
    langs = {r["lang"] for r in rows}
    assert "javascript" not in langs
    n_py_all = docs_sdf.filter("lang = 'python'").count()
    assert sum(1 for r in rows if r["lang"] == "python") == n_py_all
    # default stratum members match the plain hash rule at 0.5
    other = [
        int(r["doc_id"])
        for r in docs_sdf.filter("lang NOT IN ('python','javascript')")
        .select("doc_id")
        .collect()
    ]
    want = {d for d in other if _py_u32("t1", d) < int(0.5 * 2**32)}
    got = {
        int(r["doc_id"])
        for r in rows
        if r["lang"] not in ("python", "javascript")
    }
    assert got == want


def test_dedup_corpus_exact_and_near(spark, docs_sdf, corpus_pd):
    # exact: survivors = min doc_id per identical content
    out = dedup_corpus(docs_sdf, text_col="content", method="exact")
    got = {int(r["doc_id"]) for r in out.select("doc_id").collect()}
    by_text: dict[str, int] = {}
    for _, r in corpus_pd.iterrows():
        t = r["content"]
        by_text[t] = min(by_text.get(t, 10**9), int(r["doc_id"]))
    assert got == set(by_text.values())
    assert out.columns == docs_sdf.columns  # full rows survive

    # near: survivors = cluster canonicals + unpaired docs
    from dts.cluster import dup_clusters

    clusters = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in dup_clusters(
            docs_sdf, text_col="content", n=3, threshold=0.6
        ).collect()
    }
    near = dedup_corpus(
        docs_sdf, text_col="content", method="near", n=3, threshold=0.6
    )
    got_n = {int(r["doc_id"]) for r in near.select("doc_id").collect()}
    all_ids = {int(d) for d in corpus_pd["doc_id"]}
    want_n = all_ids - {d for d, c in clusters.items() if d != c}
    assert got_n == want_n
    with pytest.raises(ValueError, match="method"):
        dedup_corpus(docs_sdf, method="nope")
