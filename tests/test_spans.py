"""Span queries vs a brute-force python replay over the corpus tokens."""

from __future__ import annotations

import pytest

from dts.index_build import build_index
from dts.spans import span_first_counts, span_near_counts
from dts.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def sp_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sp_index"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16, positions=True)
    return d


@pytest.fixture(scope="module")
def doc_toks(corpus_pd):
    return {
        int(r["doc_id"]): tokenize_text(r["content"])
        for _, r in corpus_pd.iterrows()
    }


def _first_replay(doc_toks, term, limit):
    out = {}
    for d, toks in doc_toks.items():
        n = sum(1 for t in toks[:limit] if t == term)
        if n:
            out[d] = n
    return out


def _near_replay(doc_toks, terms, slop):
    """Distinct starts p with SOME ordered chain q_0=p<q_1<…<q_{m-1},
    q_i ∈ pos(t_i), total span q_{m-1}−p ≤ (m−1)+slop. Brute force."""
    m = len(terms)
    budget = (m - 1) + slop
    out = {}
    for d, toks in doc_toks.items():
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
        if any(not pos[t] for t in terms):
            continue
        n = 0
        for p in pos[terms[0]]:

            def chain_exists(i, cur):
                if i == m:
                    return True
                for q in pos[terms[i]]:
                    if q > cur and q - p <= budget:
                        if chain_exists(i + 1, q):
                            return True
                return False

            if chain_exists(1, p):
                n += 1
        if n:
            out[d] = n
    return out


def test_span_first_vs_replay(spark, sp_index, doc_toks, corpus_pd):
    t0 = tokenize_text(corpus_pd["content"].iloc[0])[0]
    t1 = tokenize_text(corpus_pd["content"].iloc[3])[2]
    qs = [(0, t0, 3), (1, t1, 8), (2, t0, 1), (3, "zzznope", 5)]
    q = spark.createDataFrame(qs, "sq_id long, term string, limit int")
    got = span_first_counts(spark, sp_index, q).toPandas()
    for sq_id, term, limit in qs:
        want = _first_replay(doc_toks, term, limit)
        g = got[got["sq_id"] == sq_id]
        assert dict(zip(g["doc_id"].astype(int), g["n_matches"].astype(int))) == want, (
            sq_id,
            term,
            limit,
        )


def test_span_near_vs_replay(spark, sp_index, doc_toks, corpus_pd):
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    two = f"{toks[0]} {toks[2]}"
    three = f"{toks[0]} {toks[1]} {toks[3]}"
    qs = [(0, two, 0), (1, two, 3), (2, three, 2), (3, f"{toks[1]} zzz", 4)]
    q = spark.createDataFrame(qs, "sq_id long, text string, slop int")
    got = span_near_counts(spark, sp_index, q).toPandas()
    for sq_id, text, slop in qs:
        want = _near_replay(doc_toks, text.split(), slop)
        g = got[got["sq_id"] == sq_id]
        assert dict(zip(g["doc_id"].astype(int), g["n_matches"].astype(int))) == want, (
            sq_id,
            text,
            slop,
        )


def test_span_near_slop0_is_exact_phrase(spark, sp_index, corpus_pd):
    from dts.phrase import phrase_match_counts

    toks = tokenize_text(corpus_pd["content"].iloc[1])
    text = f"{toks[0]} {toks[1]}"
    q = spark.createDataFrame([(0, text, 0)], "sq_id long, text string, slop int")
    near = {
        (int(r["doc_id"]), int(r["n_matches"]))
        for r in span_near_counts(spark, sp_index, q).collect()
    }
    pq = spark.createDataFrame([(0, text)], "phrase_id long, text string")
    ph = {
        (int(r["doc_id"]), int(r["n_matches"]))
        for r in phrase_match_counts(spark, sp_index, pq).collect()
    }
    assert near == ph and len(near) > 0


def test_span_validation(spark, sp_index):
    with pytest.raises(ValueError, match=">= 2 terms"):
        span_near_counts(
            spark,
            sp_index,
            spark.createDataFrame([(0, "solo", 1)], "sq_id long, text string, slop int"),
        ).collect()
    with pytest.raises(ValueError, match="slop"):
        span_near_counts(
            spark,
            sp_index,
            spark.createDataFrame([(0, "a b", -1)], "sq_id long, text string, slop int"),
        ).collect()


def _pp_replay(doc_toks, vocab, text, max_expansions=50):
    toks = text.split()
    lead, prefix = toks[:-1], toks[-1]
    exps = sorted(t for t in vocab if t.startswith(prefix))[:max_expansions]
    eset = set(exps)
    m = len(toks)
    out = {}
    for d, dt in doc_toks.items():
        n = 0
        for j in range(len(dt) - m + 1):
            if dt[j : j + m - 1] == lead and dt[j + m - 1] in eset:
                n += 1
        if n:
            out[d] = n
    return out


def test_phrase_prefix_vs_replay(spark, sp_index, doc_toks, corpus_pd):
    from dts.phrase import phrase_prefix_counts

    vocab = {t for toks in doc_toks.values() for t in toks}
    t = tokenize_text(corpus_pd["content"].iloc[0])
    qs = [
        (0, f"{t[0]} {t[1][:2]}"),      # bigram with prefix tail
        (1, f"{t[2][:1]}"),             # bare prefix (m=1)
        (2, f"{t[0]} {t[1]} zzzq"),     # dead prefix -> no rows
    ]
    q = spark.createDataFrame(qs, "pp_id long, text string")
    got = phrase_prefix_counts(spark, sp_index, q).toPandas()
    for pp_id, text in qs:
        want = _pp_replay(doc_toks, vocab, text)
        g = got[got["pp_id"] == pp_id]
        assert dict(zip(g["doc_id"].astype(int), g["n_matches"].astype(int))) == want, (
            pp_id,
            text,
        )
    # max_expansions truncation: only the alphabetically-first expansion
    got1 = phrase_prefix_counts(
        spark, sp_index, spark.createDataFrame([qs[0]], "pp_id long, text string"),
        max_expansions=1,
    ).toPandas()
    want1 = _pp_replay(doc_toks, vocab, qs[0][1], max_expansions=1)
    assert dict(zip(got1["doc_id"].astype(int), got1["n_matches"].astype(int))) == want1


def _not_replay(doc_toks, terms, ex, slop, pre, post):
    """ANY-chain SpanNot brute force: start p counts iff SOME ordered
    chain within the total-span budget has an exclusion-free window
    [p − pre, end + post]. The engine's greedy sweep must equal this
    (minimal end ⇒ minimal window)."""
    m = len(terms)
    budget = (m - 1) + slop
    out = {}
    for d, toks in doc_toks.items():
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
        expos = [i for i, x in enumerate(toks) if x == ex]
        if any(not pos[t] for t in terms):
            continue
        n = 0
        for p in pos[terms[0]]:

            def clean(end):
                lo, hi = p - pre, end + post
                return not any(lo <= k <= hi for k in expos)

            def ok(i, cur):
                if i == m:
                    return clean(cur)
                return any(
                    ok(i + 1, q)
                    for q in pos[terms[i]]
                    if q > cur and q - p <= budget
                )

            if ok(1, p):
                n += 1
        if n:
            out[d] = n
    return out


def test_span_not_vs_replay(spark, sp_index, doc_toks, corpus_pd):
    from dts.spans import span_not_counts

    toks = tokenize_text(" ".join(corpus_pd["content"].head(40)))
    # adjacent tokens from a real doc ⇒ the m=2 span exists somewhere
    a, b, c, ex = toks[10], toks[11], toks[13], toks[12]
    cases = [
        (0, f"{a} {b}", ex, 2, 0, 0),
        (1, a, ex, 0, 1, 1),
        (2, f"{a} {b} {c}", ex, 3, 1, 1),
        (3, a, "zzqqnever", 0, 5, 5),  # exclusion never fires
    ]
    q = spark.createDataFrame(
        cases,
        "sq_id long, include string, exclude string, slop int, pre int, post int",
    )
    got = {
        (r.sq_id, r.doc_id): r.n_matches
        for r in span_not_counts(spark, sp_index, q).collect()
    }
    want = {}
    for sq, inc, ex_t, slop, pre, post in cases:
        for d, n in _not_replay(doc_toks, inc.split(), ex_t, slop, pre, post).items():
            want[(sq, d)] = n
    assert got == want
    assert any(k[0] == 0 for k in want), "case 0 vacuous"


def test_span_not_self_exclusion_and_validation(spark, sp_index, corpus_pd):
    from dts.spans import span_not_counts

    toks = tokenize_text(" ".join(corpus_pd["content"].head(40)))
    a = toks[3]
    q = spark.createDataFrame(
        [(0, a, a, 0, 0, 0)],
        "sq_id long, include string, exclude string, slop int, pre int, post int",
    )
    # a single-term span always overlaps itself as exclusion
    assert span_not_counts(spark, sp_index, q).count() == 0

    bad = [
        (0, "", a, 0, 0, 0),
        (1, a, "", 0, 0, 0),
        (2, a, f"{a} {a}", 0, 0, 0),
        (3, a, a, -1, 0, 0),
    ]
    for row in bad:
        qb = spark.createDataFrame(
            [row],
            "sq_id long, include string, exclude string, slop int, pre int, post int",
        )
        with pytest.raises(ValueError):
            span_not_counts(spark, sp_index, qb)


# ---------------------------------------------------------------------------
# ES intervals: unordered match with max_gaps (anchor-cover counting).


def _interval_replay(doc_toks, terms, max_gaps):
    """Count distinct anchor positions p (an occurrence of ANY term) such
    that every term occurs in [p, p + len(terms) + max_gaps − 1]."""
    m = len(terms)
    win = m + max_gaps
    out = {}
    for d, toks in doc_toks.items():
        pos = {t: {i for i, x in enumerate(toks) if x == t} for t in terms}
        if any(not pos[t] for t in terms):
            continue
        anchors = sorted(set().union(*pos.values()))
        n = 0
        for p in anchors:
            if all(
                any(p <= q <= p + win - 1 for q in pos[t]) for t in terms
            ):
                n += 1
        if n:
            out[d] = n
    return out


def test_interval_unordered_vs_replay(spark, sp_index, doc_toks, corpus_pd):
    from dts.spans import interval_unordered_counts

    toks = tokenize_text(corpus_pd["content"].iloc[0])
    a, b = toks[0], toks[2]
    qs = [
        (0, f"{a} {b}", 0),
        (1, f"{a} {b}", 3),
        (2, f"{b} {a}", 3),        # order-free: same result as (1)
        (3, f"{toks[0]} {toks[1]} {toks[3]}", 2),
        (4, f"{a} zzznope", 5),
    ]
    q = spark.createDataFrame(qs, "iq_id long, text string, max_gaps int")
    got = interval_unordered_counts(spark, sp_index, q).toPandas()
    for iq_id, text, g_ in qs:
        want = _interval_replay(doc_toks, text.split(), g_)
        g = got[got["iq_id"] == iq_id]
        assert (
            dict(zip(g["doc_id"].astype(int), g["n_matches"].astype(int)))
            == want
        ), (iq_id, text, g_)
    # unordered is symmetric in the terms
    g1 = got[got["iq_id"] == 1].set_index("doc_id")["n_matches"]
    g2 = got[got["iq_id"] == 2].set_index("doc_id")["n_matches"]
    assert g1.sort_index().equals(g2.sort_index())


def test_interval_unordered_catches_reversed_order(spark, docs_sdf, tmp_path):
    """A doc where the terms appear only in REVERSE order: ordered
    span_near misses it, unordered intervals match it."""
    from dts.index_build import build_index as _build
    from dts.spans import interval_unordered_counts, span_near_counts

    spark2 = docs_sdf.sparkSession
    docs = spark2.createDataFrame(
        [(0, "beta alpha x y"), (1, "alpha q beta"), (2, "alpha zz")],
        "doc_id long, content string",
    )
    d = str(tmp_path / "iv")
    _build(spark2, docs, d, bucket_size=2, block_size=4, positions=True)
    q_iv = spark2.createDataFrame(
        [(0, "alpha beta", 1)], "iq_id long, text string, max_gaps int"
    )
    q_sn = spark2.createDataFrame(
        [(0, "alpha beta", 1)], "sq_id long, text string, slop int"
    )
    iv = {
        int(r["doc_id"]) for r in interval_unordered_counts(
            spark2, d, q_iv
        ).collect()
    }
    sn = {
        int(r["doc_id"]) for r in span_near_counts(spark2, d, q_sn).collect()
    }
    assert iv == {0, 1}   # doc 0 matches only unordered
    assert sn == {1}


def test_interval_unordered_validation(spark, sp_index):
    from dts.spans import interval_unordered_counts

    with pytest.raises(ValueError, match="repeated term"):
        interval_unordered_counts(
            spark,
            sp_index,
            spark.createDataFrame(
                [(0, "aa aa", 1)], "iq_id long, text string, max_gaps int"
            ),
        )
    with pytest.raises(ValueError, match=">= 2 terms"):
        interval_unordered_counts(
            spark,
            sp_index,
            spark.createDataFrame(
                [(0, "solo", 1)], "iq_id long, text string, max_gaps int"
            ),
        )
