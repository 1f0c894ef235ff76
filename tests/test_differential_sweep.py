"""Multi-seed randomized differential sweep — the reference's own test
methodology (src/test_generation.py samples N random instances, runs the
engine and the sequential oracle on identical inputs, and demands exact
equality; first mismatch fails). Here: fresh corpora and query sets per
seed through the FULL persisted-index engine vs the oracle."""

from __future__ import annotations

import math

import pytest

from dts.corpus import make_corpus, make_queries
from dts.index_build import build_index
from dts.oracle import OracleIndex
from dts.score_index import bm25_topk_indexed, match_counts_indexed
from dts.tokenizer import tokenize_text


@pytest.mark.parametrize("seed", [7, 1234, 999])
def test_random_instance_rank_identity(spark, tmp_path, seed):
    corpus = make_corpus(n_docs=120, seed=seed)
    corpus = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    corpus["doc_id"] = corpus.index.astype("int64")
    queries = make_queries(n_queries=15, seed=seed)

    docs_sdf = spark.createDataFrame(corpus)
    idx = str(tmp_path / f"idx_{seed}")
    build_index(spark, docs_sdf, idx, bucket_size=48, block_size=8)

    oracle = OracleIndex(list(zip(corpus["doc_id"], corpus["content"])))
    q_sdf = spark.createDataFrame(queries[["query_id", "text", "fuzzy_k"]])

    got = bm25_topk_indexed(spark, idx, q_sdf, k=10).collect()
    want = {}
    for q in queries.itertuples():
        for rank, doc_id, score in oracle.score_query(q.text, int(q.fuzzy_k), 10):
            want[(q.query_id, rank)] = (doc_id, score)
    assert {(r["query_id"], r["rank"]) for r in got} == set(want), f"seed {seed}"
    for r in got:
        doc_id, score = want[(r["query_id"], r["rank"])]
        assert r["doc_id"] == doc_id, (seed, r)
        assert r["score"] == score, (seed, "bit identity", r["score"], score)

    # Exact integer equality of the match-count vector (the reference's
    # acceptance criterion, src/test_generation.py:170-178).
    counts = {
        r["query_id"]: r["n_matches"]
        for r in match_counts_indexed(spark, idx, q_sdf).collect()
    }
    for q in queries.itertuples():
        expect = sum(
            sum(oracle.match_counts(t, int(q.fuzzy_k)).values())
            for t in tokenize_text(q.text)
        )
        assert counts[q.query_id] == expect, (seed, q.query_id)


@pytest.mark.parametrize("seed", [11, 4242])
def test_random_instance_positional_and_byte_ops(spark, tmp_path, seed):
    """Round-2 operators under the same randomized differential protocol:
    phrase counts, proximity counts, and byte-window counts on fresh random
    corpora must equal the single-process oracle exactly."""
    import numpy as np

    from dts.bytematch import byte_match_counts
    from dts.oracle import byte_match_count, phrase_count, proximity_count
    from dts.phrase import phrase_match_counts, proximity_match_counts

    rng = np.random.RandomState(seed)
    corpus = make_corpus(n_docs=90, seed=seed)
    corpus = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    corpus["doc_id"] = corpus.index.astype("int64")
    docs_sdf = spark.createDataFrame(corpus)
    idx = str(tmp_path / f"pos_idx_{seed}")
    build_index(spark, docs_sdf, idx, bucket_size=32, block_size=8, positions=True)

    # phrases: random n-grams sampled from random docs (+ guaranteed miss)
    phrases = []
    for i in range(8):
        toks = tokenize_text(corpus["content"].iloc[rng.randint(len(corpus))])
        m = int(rng.randint(1, 4))
        if len(toks) >= m:
            j = rng.randint(len(toks) - m + 1)
            phrases.append((i, " ".join(toks[j : j + m])))
    phrases.append((98, "zzz yyy"))
    ph_sdf = spark.createDataFrame(phrases, "phrase_id long, text string")
    got_ph = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match_counts(spark, idx, ph_sdf).collect()
    }
    want_ph = {}
    for pid, p in phrases:
        terms = tokenize_text(p)
        for row in corpus.itertuples():
            c = phrase_count(row.content, terms)
            if c:
                want_ph[(pid, row.doc_id)] = c
    assert got_ph == want_ph, seed

    # proximity: random co-occurring pairs, random slop
    slop = int(rng.randint(1, 5))
    pairs = []
    for i in range(6):
        toks = tokenize_text(corpus["content"].iloc[rng.randint(len(corpus))])
        if len(toks) >= 5:
            a = int(rng.randint(len(toks) - 1))
            pairs.append((i, toks[a], toks[rng.randint(a + 1, len(toks))]))
    pr_sdf = spark.createDataFrame(pairs, "pair_id long, term_a string, term_b string")
    got_pr = {
        (r["pair_id"], r["doc_id"]): r["n_matches"]
        for r in proximity_match_counts(spark, idx, pr_sdf, slop=slop).collect()
    }
    want_pr = {}
    for pid, a, b in pairs:
        for row in corpus.itertuples():
            c = proximity_count(row.content, a, b, slop)
            if c:
                want_pr[(pid, row.doc_id)] = c
    assert got_pr == want_pr, (seed, slop)

    # byte windows: random substrings of random docs (truncation exercised
    # by patterns sampled near document ends), random k
    pats = []
    for i in range(5):
        t = corpus["content"].iloc[rng.randint(len(corpus))]
        if len(t) >= 6:
            j = rng.randint(max(1, len(t) - 12), len(t) - 3)
            pats.append((i, t[j : j + int(rng.randint(3, 9))], int(rng.randint(0, 3))))
    sub = corpus.head(25)
    pat_sdf = spark.createDataFrame(pats, "pat_id long, pattern string, k int")
    got_bm = {
        (r["pat_id"], r["doc_id"]): r["n_matches"]
        for r in byte_match_counts(
            spark.createDataFrame(sub[["doc_id", "content"]]), pat_sdf,
            text_col="content",
        ).collect()
    }
    for pid, p, k in pats:
        for row in sub.itertuples():
            assert got_bm[(pid, row.doc_id)] == byte_match_count(row.content, p, k), (
                seed, pid, row.doc_id,
            )


@pytest.mark.parametrize("seed", [21, 777])
def test_random_instance_boolean_and_wildcard(spark, tmp_path, seed):
    """Random corpora through the boolean and wildcard surfaces vs the
    oracle: conjunction/negation sets and pattern expansions sampled from
    the corpus' own vocabulary (plus misses)."""
    import numpy as np

    from dts.boolquery import boolean_match_docs
    from dts.wildcard import bm25_topk_wildcard, wildcard_match_counts

    rng = np.random.RandomState(seed)
    corpus = make_corpus(n_docs=100, seed=seed)
    corpus = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    corpus["doc_id"] = corpus.index.astype("int64")
    docs_sdf = spark.createDataFrame(corpus)
    idx = str(tmp_path / f"bw_{seed}")
    build_index(spark, docs_sdf, idx, bucket_size=48, block_size=8)
    oracle = OracleIndex(list(zip(corpus["doc_id"], corpus["content"])))
    vocab = oracle.vocab

    def pick():
        return vocab[rng.randint(len(vocab))]

    bool_cases = [
        (i, f"{pick()} {pick()}", pick() if i % 2 else "") for i in range(8)
    ] + [(8, pick(), "zzmiss"), (9, f"{pick()} zzmiss", "")]
    got = boolean_match_docs(
        spark, idx,
        spark.createDataFrame(
            bool_cases, "bq_id long, must string, must_not string"
        ),
    ).toPandas()
    by_q = {int(b): set(g["doc_id"].astype(int)) for b, g in got.groupby("bq_id")}
    for bq_id, must, must_not in bool_cases:
        m = set(tokenize_text(must))
        n = set(tokenize_text(must_not))
        want = {
            int(r["doc_id"])
            for _, r in corpus.iterrows()
            if m <= set(tokenize_text(r["content"]))
            and not (n & set(tokenize_text(r["content"])))
        }
        assert by_q.get(bq_id, set()) == want, (seed, bq_id)

    pats = [(i, pick()[: rng.randint(1, 4)] + "*") for i in range(6)]
    pats += [(6, "*" + pick()[-2:]), (7, "zzmiss*")]
    pats_sdf = spark.createDataFrame(pats, "wq_id long, pattern string")
    counts = {
        int(r["wq_id"]): int(r["n_matches"])
        for r in wildcard_match_counts(spark, idx, pats_sdf).collect()
    }
    for wq_id, p in pats:
        want = sum(
            sum(oracle.tf[t].values()) for t in oracle.wildcard_expand(p)
        )
        assert counts[wq_id] == want, (seed, p)
    topk = bm25_topk_wildcard(spark, idx, pats_sdf, k=10).toPandas()
    for wq_id, p in pats:
        want = oracle.score_terms(oracle.wildcard_expand(p), topk=10)
        g = topk[topk["query_id"] == wq_id].sort_values("rank")
        assert list(g["doc_id"].astype(int)) == [d for _, d, _ in want], (seed, p)
        assert list(g["score"]) == [s for *_, s in want], (seed, "bit identity", p)
