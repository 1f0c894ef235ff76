"""Snippet extraction vs a direct python replay (first-occurrence window
semantics, clamping at doc start, absent patterns dropped) and the
composed search_with_snippets surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dts.index_build import build_index
from dts.snippet import search_with_snippets, snippet_matches
from dts.tokenizer import tokenize_text


def _py_snippet(text: str, needle: str, width: int):
    pos = text.lower().find(needle.lower()) + 1
    if pos == 0:
        return None
    start = max(1, pos - width)
    return pos, text[start - 1 : start - 1 + len(needle) + 2 * width]


def test_snippet_matches_vs_python(spark, docs_sdf, corpus_pd):
    needles = [
        (0, tokenize_text(corpus_pd["content"].iloc[0])[0]),
        (1, corpus_pd["content"].iloc[1][:1]),  # doc-start clamp case
        (2, "zzqqneverthere"),
    ]
    pat = spark.createDataFrame(needles, "pat_id long, pattern string")
    got = snippet_matches(
        docs_sdf.select("doc_id", "content"), pat, width=9
    ).toPandas()
    by_key = {
        (int(r["pat_id"]), int(r["doc_id"])): (int(r["pos"]), r["snippet"])
        for _, r in got.iterrows()
    }
    n_checked = 0
    for _, doc in corpus_pd.iterrows():
        for pid, needle in needles:
            want = _py_snippet(doc["content"], needle, 9)
            key = (pid, int(doc["doc_id"]))
            if want is None:
                assert key not in by_key
            else:
                assert by_key[key] == want
                n_checked += 1
    assert n_checked > 0
    assert not [k for k in by_key if k[0] == 2]  # miss pattern: no rows


def test_search_with_snippets(spark, docs_sdf, corpus_pd, tmp_path):
    d = str(tmp_path / "snipidx")
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    texts = [
        " ".join(tokenize_text(c)[:2])
        for c in corpus_pd["content"]
        if len(tokenize_text(c)) >= 2
    ][:3]
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in enumerate(texts)],
        "query_id long, text string, fuzzy_k int",
    )
    got = search_with_snippets(
        spark, d, docs_sdf.select("doc_id", "content"), q, k=5, width=10
    ).toPandas()
    content = dict(
        zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"])
    )
    assert set(got["query_id"]) == {0, 1, 2}
    for _, r in got.iterrows():
        fterm = texts[int(r["query_id"])].split()[0]
        want = _py_snippet(content[int(r["doc_id"])], fterm, 10)
        if want is None:
            assert int(r["pos"]) == 0
        else:
            assert (int(r["pos"]), r["snippet"]) == want
    # ranks are dense 1..k per query
    for qid, g in got.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
