"""Ingest invariants: per-row sha256 (BASELINE.json input_hint) and stable,
dense, deterministic doc_id assignment."""

from __future__ import annotations

import hashlib

from dts.io import ingest


def test_sha256_invariant_matches_python(spark, corpus_pd):
    docs = spark.createDataFrame(corpus_pd.drop(columns=["doc_id"]))
    out = ingest(docs, n_shards=8).collect()
    for r in out[:50] + out[-10:]:
        want = hashlib.sha256(r["content"].encode("utf-8")).hexdigest()
        assert r["content_sha256"] == want, (r["repo"], r["path"])


def test_doc_ids_dense_and_ordered(spark, corpus_pd):
    docs = spark.createDataFrame(corpus_pd.drop(columns=["doc_id"]))
    out = ingest(docs, n_shards=8).select("repo", "path", "commit", "doc_id", "shard_id")
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    n = len(rows)
    assert [r["doc_id"] for r in rows] == list(range(n))
    # doc_id order == (repo, path, commit) order — the oracle's convention.
    keys = [(r["repo"], r["path"], r["commit"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["shard_id"] == r["doc_id"] % 8 for r in rows)


def test_ingest_deterministic_across_runs(spark, corpus_pd):
    docs = spark.createDataFrame(corpus_pd.drop(columns=["doc_id"]))
    a = {(r["repo"], r["path"]): r["doc_id"] for r in ingest(docs).collect()}
    b = {(r["repo"], r["path"]): r["doc_id"] for r in ingest(docs).collect()}
    assert a == b
