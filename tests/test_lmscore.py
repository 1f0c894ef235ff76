"""CCNet-style LM perplexity vs a pure-python replay of the formula."""

from __future__ import annotations

import math
import re

from dts.lmscore import doc_lm_perplexity, unigram_counts
from dts.phrasesuggest import ALPHA, TOK, bigram_counts


def _replay(lm_texts, score_texts, alpha=ALPHA):
    lm_toks = [re.findall(TOK, t.lower()) for t in lm_texts]
    cf, bc = {}, {}
    for ts in lm_toks:
        for w in ts:
            cf[w] = cf.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    total = float(sum(cf.values()))
    out = {}
    for i, t in enumerate(score_texts):
        ts = re.findall(TOK, t.lower())
        if not ts:
            continue
        lp = math.log((cf.get(ts[0], 0) + 0.5) / total)
        for a, b in zip(ts, ts[1:]):
            if (a, b) in bc:
                lp += math.log(bc[(a, b)] / cf[a])
            else:
                lp += math.log(alpha * (cf.get(b, 0) + 0.5) / total)
        out[i] = (len(ts), lp, math.exp(-lp / len(ts)))
    return out


def test_lm_perplexity_self(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat",
        "zz yy xx ww",
        "the the the the",
        "",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        int(r["doc_id"]): r
        for r in doc_lm_perplexity(
            docs, bigram_counts(docs), unigram_counts(docs)
        ).collect()
    }
    want = _replay(texts, texts)
    assert set(got) == set(want)  # empty doc drops
    for i, (n, lp, ppl) in want.items():
        assert got[i]["n_tokens"] == n
        assert abs(got[i]["logprob6"] - round(lp, 6)) < 2e-6
        assert abs(got[i]["ppl6"] - round(ppl, 6)) < 2e-6


def test_lm_perplexity_cross_corpus_ranks_quality(spark):
    """A clean-reference LM scores in-distribution text lower-ppl than
    out-of-vocabulary junk — the CCNet filter signal."""
    lm_texts = ["the cat sat on the mat"] * 5 + ["a dog ran in the park"] * 5
    score_texts = ["the cat sat on the mat", "qqq zzz www jjj kkk"]
    lm = spark.createDataFrame(
        list(enumerate(lm_texts)), "doc_id long, text string"
    )
    sc = spark.createDataFrame(
        list(enumerate(score_texts)), "doc_id long, text string"
    )
    got = {
        int(r["doc_id"]): r["ppl6"]
        for r in doc_lm_perplexity(
            sc, bigram_counts(lm), unigram_counts(lm)
        ).collect()
    }
    want = _replay(lm_texts, score_texts)
    assert got[0] < got[1]  # clean text ≪ junk
    for i in (0, 1):
        assert abs(got[i] - round(want[i][2], 6)) < 2e-6
