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


def test_assign_doc_ids_base_and_no_single_partition(spark, corpus_pd):
    """Round-2: id assignment with a base offset (the merge path) is dense,
    key-ordered, and never funnels through a single-partition exchange."""
    from dts.io import assign_doc_ids

    docs = spark.createDataFrame(corpus_pd.drop(columns=["doc_id"]))
    out = assign_doc_ids(docs, base=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == list(range(1000, 1000 + len(corpus_pd)))
    # key order preserved: doc_id ascending == (repo, path, commit) ascending
    rows = out.select("repo", "path", "commit", "doc_id").collect()
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    assert [(r["repo"], r["path"], r["commit"]) for r in by_id] == sorted(
        (r["repo"], r["path"], r["commit"]) for r in rows
    )


def test_assign_doc_ids_without_natural_key(spark):
    """Fallback md5(content) key: dense ids, deterministic across layouts."""
    from dts.io import assign_doc_ids

    pdf = [(f"text number {i}",) for i in range(97)]
    a = assign_doc_ids(spark.createDataFrame(pdf, "content string"))
    b = assign_doc_ids(spark.createDataFrame(pdf, "content string").repartition(7))
    am = {r["content"]: r["doc_id"] for r in a.collect()}
    bm = {r["content"]: r["doc_id"] for r in b.collect()}
    assert sorted(am.values()) == list(range(97))
    assert am == bm
    assert "_sortkey" not in a.columns
