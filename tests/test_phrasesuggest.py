"""Phrase suggester (dts.phrasesuggest): bigram LM replay, stupid
backoff branches, beam behavior, empty/OOV edges."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from dts.index_build import build_index
from dts.phrasesuggest import bigram_counts, suggest_phrases


@pytest.fixture(scope="module")
def ps_setup(spark, tmp_path_factory):
    texts = [
        "fast join fast join fast join table",
        "fast join beats slow scan every time",
        "table scan table scan table scan",
        "join table join table",
        "slow scan slow scan",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    d = str(tmp_path_factory.mktemp("ps") / "idx")
    build_index(spark, docs, d, bucket_size=16)
    bg = bigram_counts(
        docs.withColumnRenamed("content", "text")
    ).cache()
    bg.count()
    return d, bg, texts


def _replay(texts, cands_by_tok, queries, alpha=0.4, n=3):
    toks_all = [t for x in texts for t in re.findall("[a-z0-9]+", x.lower())]
    uni = Counter(toks_all)
    total = float(sum(uni.values()))
    big = Counter(zip(toks_all[:-1], toks_all[1:]))
    # per-doc adjacency, not corpus-concatenated:
    big = Counter()
    for x in texts:
        ts = re.findall("[a-z0-9]+", x.lower())
        big.update(zip(ts[:-1], ts[1:]))
    out = {}
    for qid, text in queries:
        toks = re.findall("[a-z0-9]+", text.lower())
        from itertools import product

        scored = []
        for combo in product(*[cands_by_tok.get(t) or [t] for t in toks]):
            s = math.log((uni.get(combo[0], 0) + 0.5) / total)
            for a, b in zip(combo, combo[1:]):
                if big.get((a, b)):
                    s += math.log(big[(a, b)] / uni[a])
                else:
                    s += math.log(alpha * (uni.get(b, 0) + 0.5) / total)
            scored.append((round(s, 6), " ".join(combo)))
        best = sorted(scored, key=lambda x: (-x[0], x[1]))[:n]
        out[qid] = [(p, s) for s, p in best]
    return out


def test_suggest_phrases_vs_replay(spark, ps_setup):
    from dts.suggest import suggest_terms

    d, bg, texts = ps_setup
    queries = [(0, "fastt join"), (1, "tble scann"), (2, "slow scan")]
    toks = sorted({t for _, q in queries for t in q.split()})
    cand_rows = suggest_terms(
        spark, d, toks, max_k=1, n=3, include_exact=True
    ).collect()
    cands = {}
    for r in cand_rows:
        cands.setdefault(r["input"], []).append(r["suggestion"])
    got = {}
    for r in suggest_phrases(
        spark, d, queries, bg, max_k=1, per_token=3, n=3
    ).collect():
        got.setdefault(int(r["query_id"]), []).append(
            (r["suggestion"], float(r["score6"]))
        )
    want = _replay(texts, cands, queries)
    for qid in want:
        assert [p for p, _ in got[qid]] == [p for p, _ in want[qid]], qid
        for (gp, gs), (wp, ws) in zip(got[qid], want[qid]):
            assert abs(gs - ws) < 2e-6
    # the corrected real phrase wins over the literal misspelling
    # (inputs chosen inside the trigram prefilter's reach — the floor
    # max(1,|tri|-3k) is engine SPEC and misses mid-word errors in
    # 4-char words, e.g. "fost"→"fast" shares no trigram)
    assert got[0][0][0] == "fast join"
    assert got[1][0][0] in ("table scan",)
    # a correct query keeps itself on top (bigram evidence)
    assert got[2][0][0] == "slow scan"


def test_suggest_phrases_oov_and_empty(spark, ps_setup):
    d, bg, _ = ps_setup
    out = suggest_phrases(
        spark, d, [(0, "zzz9qqq join"), (1, "")], bg, max_k=1
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(int(r["query_id"]), []).append(r["suggestion"])
    assert 1 not in by_q  # empty query: no rows
    assert any(s.endswith(" join") for s in by_q[0])  # OOV token kept/backed off
