"""Incremental merge: appended docs are queryable, stats update, results
match an oracle over the combined corpus; bmw safety flag honored."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from dts.index_build import build_index, load_meta, merge_index
from dts.oracle import OracleIndex
from dts.score_index import bm25_topk_indexed


def test_merge_matches_oracle_on_combined_corpus(spark, corpus_pd, tmp_path):
    idx = str(tmp_path / "merge_idx")
    split = 150
    old_pd = corpus_pd.iloc[:split]
    new_pd = corpus_pd.iloc[split:].copy()

    build_index(spark, spark.createDataFrame(old_pd), idx, bucket_size=64)
    meta0 = load_meta(idx)
    assert meta0["n_docs"] == split

    meta1 = merge_index(
        spark,
        idx,
        spark.createDataFrame(new_pd.drop(columns=["doc_id"])),
    )
    assert meta1["n_docs"] == len(corpus_pd)

    # Oracle over the combined corpus with merge-order doc_ids: old ids as
    # assigned, new ids continue from `split` in arrival (row) order.
    docs = list(zip(old_pd["doc_id"], old_pd["content"])) + [
        (split + i, c) for i, c in enumerate(new_pd["content"])
    ]
    oracle = OracleIndex(docs)

    q = spark.createDataFrame(
        [(0, "def import", 0), (1, "value data result", 0)],
        "query_id long, text string, fuzzy_k int",
    )
    got = bm25_topk_indexed(spark, idx, q, k=10).collect()
    assert len(got) > 0
    want = {}
    for qid, text in [(0, "def import"), (1, "value data result")]:
        for rank, doc_id, score in oracle.score_query(text, 0, 10):
            want[(qid, rank)] = (doc_id, score)
    for r in got:
        doc_id, score = want[(r["query_id"], r["rank"])]
        assert r["doc_id"] == doc_id, (r, doc_id)
        assert math.isclose(r["score"], score, rel_tol=1e-9)
    # top-k must include post-merge docs for at least one query (the new
    # half contains the same Zipf head terms).
    assert any(r["doc_id"] >= split for r in got)

    # bmw gate: avgdl moved ⇒ only allowed if still ≤ every encode avgdl.
    if not meta1["bmw_safe"]:
        with pytest.raises(ValueError, match="bmw"):
            bm25_topk_indexed(spark, idx, q, k=10, strategy="bmw").collect()

    # Compaction merges duplicate (term,bucket) rows, restores bmw safety,
    # and changes NO results (TAAT before == TAAT after == BMW after).
    from dts.index_build import compact_index

    before = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_indexed(spark, idx, q, k=10).collect()
    )
    meta2 = compact_index(spark, idx)
    assert meta2["bmw_safe"] is True
    after_taat = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_indexed(spark, idx, q, k=10).collect()
    )
    after_bmw = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_indexed(spark, idx, q, k=10, strategy="bmw").collect()
    )
    assert before == after_taat == after_bmw


def test_term_vectors_lifecycle(spark, corpus_pd, tmp_path):
    """TermVectors sidecar: build fetch == tokenize replay; merge appends
    the new docs' vectors; deletion masks before compact; compact drops
    the rows physically."""
    from collections import Counter

    from dts.delete import delete_docs
    from dts.index_build import compact_index
    from dts.termvectors import term_vectors
    from dts.tokenizer import tokenize_text

    idx = str(tmp_path / "tv_idx")
    split = 150
    build_index(
        spark, spark.createDataFrame(corpus_pd.iloc[:split]), idx,
        bucket_size=64, store_term_vectors=True,
    )

    def replay(i):
        return Counter(tokenize_text(corpus_pd["content"].iloc[i]))

    got = {
        (int(r["doc_id"]), r["term"]): int(r["tf"])
        for r in term_vectors(spark, idx, doc_ids=[0, 7]).collect()
    }
    want = {
        (i, t): c for i in (0, 7) for t, c in replay(i).items()
    }
    assert got == want

    merge_index(
        spark, idx,
        spark.createDataFrame(corpus_pd.iloc[split:].drop(columns=["doc_id"])),
    )
    new_id = split  # first merged doc gets the watermark id
    got_new = {
        r["term"]: int(r["tf"])
        for r in term_vectors(spark, idx, doc_ids=[new_id]).collect()
    }
    assert got_new == dict(replay(split))

    delete_docs(spark, idx, [7])
    assert term_vectors(spark, idx, doc_ids=[0, 7]).filter(
        "doc_id = 7"
    ).count() == 0  # masked while tombstoned
    assert term_vectors(
        spark, idx, doc_ids=[0, 7], mask_deleted=False
    ).filter("doc_id = 7").count() > 0
    compact_index(spark, idx)
    assert term_vectors(
        spark, idx, doc_ids=[7], mask_deleted=False
    ).count() == 0  # physically gone

    with pytest.raises(ValueError, match="term_vectors"):
        idx2 = str(tmp_path / "no_tv_idx")
        build_index(
            spark, spark.createDataFrame(corpus_pd.iloc[:20]), idx2,
            bucket_size=64,
        )
        term_vectors(spark, idx2)


def test_upsert_docs_lifecycle(spark, corpus_pd, tmp_path):
    """updateDocument semantics: replace by external key (old content
    unfindable pre-compaction via tombstone mask), insert unknown keys,
    re-upsert the same key repeatedly, reject in-batch duplicates."""
    from dts.score_index import bm25_topk_indexed
    from dts.update import upsert_docs

    idx = str(tmp_path / "up_idx")
    base = corpus_pd.head(50).copy()
    base["key"] = "k" + base["doc_id"].astype(str)
    build_index(
        spark, spark.createDataFrame(base), idx, bucket_size=16,
        store_fields=["key"],
    )

    def top_ids(text):
        q = spark.createDataFrame(
            [(0, text, 0)], "query_id long, text string, fuzzy_k int"
        )
        return [
            int(r["doc_id"])
            for r in bm25_topk_indexed(spark, idx, q, k=50).collect()
        ]

    marker = "zzxqy unique marker phrase"
    new = spark.createDataFrame(
        [("k7", f"{marker} first rewrite"), ("knew", f"{marker} inserted")],
        "key string, content string",
    )
    meta = upsert_docs(spark, idx, new, "key")
    assert meta["next_doc_id"] == 52
    hits = top_ids("zzxqy")
    assert len(hits) == 2 and all(h >= 50 for h in hits)  # new ids only
    old_text_tok = None
    import re as _re
    for t in _re.findall(r"[a-z0-9]+", corpus_pd["content"].iloc[7].lower()):
        if t not in ("the", "a"):
            old_text_tok = t
            break
    assert 7 not in top_ids(old_text_tok)  # tombstone masks old doc 7

    # re-upsert the SAME key: must tombstone the generation-2 doc
    meta = upsert_docs(
        spark,
        idx,
        spark.createDataFrame(
            [("k7", f"{marker} second rewrite")], "key string, content string"
        ),
        "key",
    )
    assert meta["next_doc_id"] == 53
    hits = top_ids("zzxqy")
    assert len(hits) == 2  # knew + the latest k7 generation only

    with pytest.raises(ValueError, match="duplicate"):
        upsert_docs(
            spark,
            idx,
            spark.createDataFrame(
                [("kx", "a"), ("kx", "b")], "key string, content string"
            ),
            "key",
        )
    with pytest.raises(ValueError, match="stored field"):
        idx2 = str(tmp_path / "up_idx2")
        build_index(
            spark, spark.createDataFrame(base), idx2, bucket_size=16
        )
        upsert_docs(
            spark, idx2,
            spark.createDataFrame([("k1", "x")], "key string, content string"),
            "key",
        )
