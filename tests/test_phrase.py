"""Positional postings + phrase queries: codec roundtrip, engine vs the
single-process oracle (including merged and compacted indexes)."""

from __future__ import annotations

import numpy as np
import pytest

from dts.codec import decode_positions, encode_positions
from dts.index_build import build_index, compact_index, load_meta, merge_index
from dts.oracle import phrase_count
from dts.phrase import phrase_match_counts
from dts.tokenizer import tokenize_text


def test_positions_codec_roundtrip():
    rng = np.random.RandomState(3)
    for _ in range(50):
        n_postings = rng.randint(1, 40)
        counts = rng.randint(1, 9, n_postings)
        lists = [
            np.cumsum(rng.randint(1, 50, c)) - 1 for c in counts
        ]  # ascending per posting
        flat = np.concatenate(lists)
        blob, offs = encode_positions(flat, counts)
        back, bounds = decode_positions(blob, counts)
        assert (back == flat).all()
        assert (bounds == np.concatenate(([0], np.cumsum(counts)))).all()
        # per-posting byte slices decode independently
        j = rng.randint(n_postings)
        piece, _ = decode_positions(
            blob[offs[j] : offs[j + 1]], counts[j : j + 1]
        )
        assert (piece == lists[j]).all()


@pytest.fixture(scope="module")
def pos_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pos_index"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16, positions=True)
    return d


def _phrases_from(corpus_pd, n=6, m=2, seed=7):
    """Sample real m-token phrases from the corpus (guaranteed hits)."""
    rng = np.random.RandomState(seed)
    out = []
    rows = corpus_pd.sample(n=n, random_state=seed)
    for _, r in rows.iterrows():
        toks = tokenize_text(r["content"])
        if len(toks) < m:
            continue
        j = rng.randint(len(toks) - m + 1)
        out.append(" ".join(toks[j : j + m]))
    out.append("zzz qqq xxx")  # guaranteed miss
    return out


@pytest.mark.parametrize("m", [1, 2, 3])
def test_phrase_match_vs_oracle(spark, pos_index, corpus_pd, m):
    phrases = _phrases_from(corpus_pd, n=6, m=m, seed=10 + m)
    ph_sdf = spark.createDataFrame(
        list(enumerate(phrases)), "phrase_id long, text string"
    )
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match_counts(spark, pos_index, ph_sdf).collect()
    }
    want = {}
    for pid, p in enumerate(phrases):
        terms = tokenize_text(p)
        for row in corpus_pd.itertuples():
            c = phrase_count(row.content, terms)
            if c:
                want[(pid, row.doc_id)] = c
    assert got == want
    assert any(v > 0 for v in want.values())  # sampled phrases really hit


def test_phrase_requires_positional_index(spark, docs_sdf, tmp_path):
    d = str(tmp_path / "plain")
    build_index(spark, docs_sdf, d, bucket_size=64)
    ph = spark.createDataFrame([(0, "def")], "phrase_id long, text string")
    with pytest.raises(ValueError, match="positional"):
        phrase_match_counts(spark, d, ph)


def test_phrase_survives_merge_and_compact(spark, corpus_pd, tmp_path):
    idx = str(tmp_path / "pos_merge")
    split = 150
    build_index(
        spark,
        spark.createDataFrame(corpus_pd.iloc[:split]),
        idx,
        bucket_size=64,
        positions=True,
    )
    merge_index(
        spark,
        idx,
        spark.createDataFrame(corpus_pd.iloc[split:].drop(columns=["doc_id"])),
    )
    assert load_meta(idx)["positions"] is True
    docs = list(zip(corpus_pd["doc_id"][:split], corpus_pd["content"][:split])) + [
        (split + i, c) for i, c in enumerate(corpus_pd["content"][split:])
    ]
    phrases = _phrases_from(corpus_pd, n=5, m=2, seed=3)
    ph_sdf = spark.createDataFrame(
        list(enumerate(phrases)), "phrase_id long, text string"
    )

    def expected():
        want = {}
        for pid, p in enumerate(phrases):
            terms = tokenize_text(p)
            for doc_id, content in docs:
                c = phrase_count(content, terms)
                if c:
                    want[(pid, doc_id)] = c
        return want

    got_merged = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match_counts(spark, idx, ph_sdf).collect()
    }
    assert got_merged == expected()
    compact_index(spark, idx)
    got_compacted = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match_counts(spark, idx, ph_sdf).collect()
    }
    assert got_compacted == expected()


def test_proximity_match_vs_oracle(spark, pos_index, corpus_pd):
    """Ordered-window proximity equals the oracle; slop=1 equals the exact
    bigram phrase counts."""
    from dts.oracle import phrase_count, proximity_count
    from dts.phrase import proximity_match_counts
    from dts.tokenizer import tokenize_text

    # real co-occurring pairs + a self-pair + a miss
    pairs = []
    for pid, text in enumerate(corpus_pd["content"].head(4)):
        toks = tokenize_text(text)
        if len(toks) >= 4:
            pairs.append((pid, toks[0], toks[3]))
    pairs.append((90, "def", "def"))
    pairs.append((91, "zzz", "qqq"))
    pr = spark.createDataFrame(pairs, "pair_id long, term_a string, term_b string")
    for slop in (1, 3):
        got = {
            (r["pair_id"], r["doc_id"]): r["n_matches"]
            for r in proximity_match_counts(spark, pos_index, pr, slop=slop).collect()
        }
        want = {}
        for pid, a, b in pairs:
            for row in corpus_pd.itertuples():
                c = proximity_count(row.content, a, b, slop)
                if c:
                    want[(pid, row.doc_id)] = c
        assert got == want, slop
        assert any(want.values())
    # slop=1 == phrase "a b"
    got1 = {
        (r["pair_id"], r["doc_id"]): r["n_matches"]
        for r in proximity_match_counts(spark, pos_index, pr, slop=1).collect()
    }
    for pid, a, b in pairs:
        for row in corpus_pd.itertuples():
            c = phrase_count(row.content, [a, b])
            assert got1.get((pid, row.doc_id), 0) == c or a == b


def test_phrase_isin_cap_semi_join_fallback(spark, pos_index, corpus_pd):
    """Above the IN-list cap the phrase term filter becomes a broadcast
    left-semi join (shared term_filter helper) — results identical and the
    plan carries no giant In(term, ...) literal list."""
    from dts.phrase import proximity_match_counts

    phrases = _phrases_from(corpus_pd, n=4, m=2, seed=11)
    ph = spark.createDataFrame(
        list(enumerate(phrases)), "phrase_id long, text string"
    )
    base = sorted(
        (r.phrase_id, r.doc_id, r.n_matches)
        for r in phrase_match_counts(spark, pos_index, ph).collect()
    )
    capped_df = phrase_match_counts(spark, pos_index, ph, max_isin_terms=1)
    capped = sorted(
        (r.phrase_id, r.doc_id, r.n_matches) for r in capped_df.collect()
    )
    assert capped == base and len(base) > 0
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan

    pairs = spark.createDataFrame(
        [(0, "def", "ident1"), (1, "value", "return")],
        "pair_id long, term_a string, term_b string",
    )
    base_p = sorted(
        (r.pair_id, r.doc_id, r.n_matches)
        for r in proximity_match_counts(spark, pos_index, pairs, slop=3).collect()
    )
    capped_p = sorted(
        (r.pair_id, r.doc_id, r.n_matches)
        for r in proximity_match_counts(
            spark, pos_index, pairs, slop=3, max_isin_terms=1
        ).collect()
    )
    assert capped_p == base_p and len(base_p) > 0


@pytest.mark.parametrize("m,slop", [(2, 2), (2, 4), (3, 2), (3, 3)])
def test_sloppy_phrase_vs_oracle(spark, pos_index, corpus_pd, m, slop):
    from dts.oracle import sloppy_phrase_count

    phrases = _phrases_from(corpus_pd, n=6, m=m, seed=40 + m + slop)
    ph_sdf = spark.createDataFrame(
        [(i, p, slop) for i, p in enumerate(phrases)],
        "phrase_id long, text string, slop int",
    )
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match_counts(spark, pos_index, ph_sdf).collect()
    }
    want = {}
    for pid, p in enumerate(phrases):
        terms = tokenize_text(p)
        for row in corpus_pd.itertuples():
            c = sloppy_phrase_count(row.content, terms, slop)
            if c:
                want[(pid, row.doc_id)] = c
    assert got == want
    assert any(v > 0 for v in want.values())
    # slop widening is monotone: every exact match survives at any slop
    exact = {
        (r["phrase_id"], r["doc_id"])
        for r in phrase_match_counts(
            spark, pos_index,
            spark.createDataFrame(
                list(enumerate(phrases)), "phrase_id long, text string"
            ),
        ).collect()
    }
    assert exact <= set(got)


def test_slop_one_equals_exact(spark, pos_index, corpus_pd):
    phrases = _phrases_from(corpus_pd, n=6, m=2, seed=77)
    exact = spark.createDataFrame(
        list(enumerate(phrases)), "phrase_id long, text string"
    )
    sloppy = spark.createDataFrame(
        [(i, p, 1) for i, p in enumerate(phrases)],
        "phrase_id long, text string, slop int",
    )
    a = sorted(
        map(tuple, phrase_match_counts(spark, pos_index, exact).collect())
    )
    b = sorted(
        map(tuple, phrase_match_counts(spark, pos_index, sloppy).collect())
    )
    assert a == b


def test_sloppy_phrase_in_search_batch(spark, pos_index, corpus_pd):
    """``"a b"~k`` parses and fuses: the filter-mode ranked set equals the
    manual composition of sloppy allow-list + term scoring."""
    from dts.oracle import sloppy_phrase_count
    from dts.parser import parse_query, search_batch
    from dts.score_index import bm25_topk_indexed

    ph = _phrases_from(corpus_pd, n=4, m=2, seed=91)[0]
    pq = parse_query(f'"{ph}"~3')
    assert pq.phrases == [ph] and pq.phrase_slops == [3]

    got = (
        search_batch(spark, pos_index, [f'"{ph}"~3'], k=10**6)
        .toPandas()
        .sort_values("rank")
    )
    allow = {
        int(r.doc_id)
        for r in corpus_pd.itertuples()
        if sloppy_phrase_count(r.content, tokenize_text(ph), 3)
    }
    flt = spark.createDataFrame([(d,) for d in sorted(allow)], "doc_id long")
    q = spark.createDataFrame(
        [(0, ph, 0)], "query_id long, text string, fuzzy_k int"
    )
    ref = (
        bm25_topk_indexed(spark, pos_index, q, k=10**6, doc_filter=flt)
        .toPandas()
        .sort_values("rank")
    )
    assert list(got["doc_id"]) == list(ref["doc_id"])
    assert list(got["score"]) == list(ref["score"])
    # a tighter slop can only shrink the match set
    tight = search_batch(spark, pos_index, [f'"{ph}"'], k=10**6).toPandas()
    assert set(tight["doc_id"]) <= set(got["doc_id"])
