"""Deterministic sampling + end-to-end dedup policy (round 4): exact
membership vs a python md5 replay, layout independence, mixture knob;
dedup_corpus vs hand-computed survivors."""

from __future__ import annotations

import hashlib
import re

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


def test_remove_duplicate_ngrams_replay_and_fast_parity(spark):
    """Span-removal dedup (Lee et al. removal stage): Python replay of
    the spec on planted shared spans; the fast Rabin-Karp path removes
    the IDENTICAL spans (all grams hashed — duplicate sets are
    content-determined, unlike winnowing's sampled fingerprints);
    within-doc repeats count toward min_count."""
    from collections import Counter

    from dts.dedup import remove_duplicate_ngrams

    k = 4
    rows = [
        (0, "a1 b2 c3 d4 e5 tail0 tail1"),
        (1, "head0 a1 b2 c3 d4 e5 head1"),        # shares the 5-token run
        (2, "u0 u1 u2 u3 u4 u5 u6 u7"),            # fully unique
        (3, "r1 r2 r3 r4 mid r1 r2 r3 r4"),        # within-doc repeat
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in remove_duplicate_ngrams(docs, k=k, hash="md5").collect()
    }

    # Python replay
    toks = {d: re.findall(r"[a-z0-9]+", (t or "").lower()) for d, t in rows}
    cnt = Counter(
        (d, " ".join(ts[i : i + k]))[1]
        for d, ts in toks.items()
        for i in range(len(ts) - k + 1)
    )
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - k + 1):
            if cnt[" ".join(ts[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        r = got[d]
        assert r.text_clean == " ".join(kept), d
        assert r.n_tokens == len(ts) and r.n_removed == len(ts) - len(kept)

    assert got[2].n_removed == 0                       # unique untouched
    assert got[3].n_removed == 8 and got[3].text_clean == "mid"
    assert got[0].text_clean == "tail0 tail1"

    fast = {
        r.doc_id: r
        for r in remove_duplicate_ngrams(docs, k=k, hash="fast").collect()
    }
    for d in got:
        assert (fast[d].text_clean, fast[d].n_removed) == (
            got[d].text_clean, got[d].n_removed,
        ), d
    with pytest.raises(ValueError, match="hash"):
        remove_duplicate_ngrams(docs, k=k, hash="sha")
