"""Did-you-mean suggestions vs a python replay over the oracle vocab."""

from __future__ import annotations

import pytest

from dts.index_build import build_index
from dts.oracle import OracleIndex, banded_levenshtein
from dts.suggest import suggest_terms
from dts.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def s_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s_index"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    return d


@pytest.fixture(scope="module")
def oracle(corpus_pd) -> OracleIndex:
    return OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )


def _replay(oracle, term, max_k=2, n=5, include_exact=False):
    # candidate generation via the SPEC rule (oracle.expand_term — the
    # trigram-prefiltered set term~k queries reach), then the suggest
    # ranking (distance ASC, cf DESC, term ASC)
    cands = []
    for t in oracle.expand_term(term, max_k):
        if t == term and not include_exact:
            continue
        d = banded_levenshtein(term, t, max_k)
        cands.append((t, d, sum(oracle.tf[t].values())))
    cands.sort(key=lambda c: (c[1], -c[2], c[0]))
    return cands[:n]


def test_suggest_misspellings(spark, s_index, corpus_pd, oracle):
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    bad = [
        (toks[0][:-1] + "x") if len(toks[0]) > 3 else toks[0] + "x",
        toks[1] + "q",
        "zzzznosuchterm",
    ]
    got_df = suggest_terms(spark, s_index, bad, max_k=2, n=5).toPandas()
    for term in bad:
        want = _replay(oracle, term)
        g = got_df[got_df["input"] == term].sort_values("rank")
        assert [
            (r["suggestion"], int(r["distance"]), int(r["cf"]))
            for _, r in g.iterrows()
        ] == want, term


def test_suggest_exact_term_behavior(spark, s_index, corpus_pd, oracle):
    t = tokenize_text(corpus_pd["content"].iloc[0])[0]
    # default: a correct word suggests OTHER nearby terms, never itself
    got = suggest_terms(spark, s_index, [t], max_k=1, n=5).toPandas()
    assert t not in set(got["suggestion"])
    # include_exact: itself at distance 0, rank 1
    got2 = suggest_terms(
        spark, s_index, [t], max_k=1, n=5, include_exact=True
    ).toPandas().sort_values("rank")
    assert got2.iloc[0]["suggestion"] == t and got2.iloc[0]["distance"] == 0
    assert suggest_terms(spark, s_index, [], n=3).count() == 0


def _complete_replay(oracle, prefix, n=5):
    cands = [
        (t, sum(tfs.values()))
        for t, tfs in oracle.tf.items()
        if t.startswith(prefix)
    ]
    cands.sort(key=lambda c: (-c[1], c[0]))
    return cands[:n]


def test_complete_prefix(spark, s_index, corpus_pd, oracle):
    from dts.suggest import complete_prefix

    toks = tokenize_text(corpus_pd["content"].iloc[0])
    prefixes = [toks[0][:2], toks[1][:1], "zzzznope"]
    got_df = complete_prefix(spark, s_index, prefixes, n=4).toPandas()
    for p in prefixes:
        want = _complete_replay(oracle, p, n=4)
        g = got_df[got_df["input"] == p].sort_values("rank")
        assert [
            (r["suggestion"], int(r["cf"])) for _, r in g.iterrows()
        ] == want, p
    # exact term completes itself (rank respects cf ordering)
    full = tokenize_text(corpus_pd["content"].iloc[0])[0]
    got = complete_prefix(spark, s_index, [full], n=3).toPandas()
    assert full in set(got["suggestion"])
    assert complete_prefix(spark, s_index, [], n=3).count() == 0
