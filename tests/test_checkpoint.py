"""Resume semantics: killed build resumes without recomputation and the
resumed index is value-identical to a from-scratch build (SURVEY.md §5.2
item 5)."""

from __future__ import annotations

import os

import pytest

from dts.checkpoint import build_index_resumable
from dts.score_index import bm25_topk_indexed


def _tree_mtimes(root: str) -> dict[str, float]:
    out = {}
    for dp, _, fns in os.walk(root):
        for fn in fns:
            p = os.path.join(dp, fn)
            out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def _postings_fingerprint(spark, index_dir: str):
    df = spark.read.parquet(f"{index_dir}/postings")
    rows = df.select(
        "term", "bucket", "n", "doc_blob", "tf_blob", "dl_blob"
    ).collect()
    return sorted(
        (r.term, r.bucket, r.n, bytes(r.doc_blob), bytes(r.tf_blob), bytes(r.dl_blob))
        for r in rows
    )


def test_killed_build_resumes_without_recompute(spark, docs_sdf, tmp_path):
    out = str(tmp_path / "idx_resumable")
    fresh = str(tmp_path / "idx_fresh")
    kw = dict(bucket_size=32, block_size=16, buckets_per_chunk=2, lineage="corpus@v1")

    # Kill after 2 fresh chunk completions (mid stage 1).
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_resumable(spark, docs_sdf, out, fail_after_chunks=2, **kw)
    assert os.path.exists(f"{out}/_manifests/tf_chunk_00000.json")
    done_before = _tree_mtimes(f"{out}/tf/chunk=0")
    assert done_before, "chunk 0 must have been written before the kill"

    # Resume: completes; chunk 0's files untouched (no recomputation).
    meta = build_index_resumable(spark, docs_sdf, out, **kw)
    assert meta["n_docs"] == docs_sdf.count()
    assert _tree_mtimes(f"{out}/tf/chunk=0") == done_before
    # The resumed run only did the REMAINING chunks.
    assert meta["chunks_fresh_this_run"] < 2 * meta["n_chunks"]
    # Round-4: the reference-shaped timing breakdown is recorded
    # (flexible_mpi.c "transmitting/computing/gathering" sidecar parity).
    bd = meta["stage_breakdown_sec"]
    assert set(bd) == {"computing", "gathering", "transmitting"}
    assert bd["computing"] > 0

    # Value-identity with a from-scratch build.
    build_index_resumable(spark, docs_sdf, fresh, **kw)
    assert _postings_fingerprint(spark, out) == _postings_fingerprint(spark, fresh)

    # And the resumed index answers queries identically.
    q = spark.createDataFrame(
        [(0, "def import", 0), (1, "ident1 value", 0)],
        "query_id long, text string, fuzzy_k int",
    )
    a = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_indexed(spark, out, q, k=10).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_indexed(spark, fresh, q, k=10).collect()
    )
    assert a == b and len(a) > 0


def test_resumable_positional_build_answers_phrase_queries(
    spark, docs_sdf, corpus_pd, tmp_path
):
    """`build --resumable --positions` must yield a phrase-capable index
    (regression: the CLI used to silently drop --positions on the
    resumable path). Checkpoint identity includes the positions flag."""
    from dts.cli import main as cli_main
    from dts.oracle import phrase_count
    from dts.phrase import phrase_match_counts
    from dts.tokenizer import tokenize_text

    docs_dir = str(tmp_path / "docs_pq")
    docs_sdf.write.parquet(docs_dir)
    out = str(tmp_path / "idx_pos_resumable")
    cli_main([
        "build", "--docs", docs_dir, "--out", out,
        "--bucket-size", "32", "--resumable", "--positions",
    ])
    import json

    with open(f"{out}/meta.json") as f:
        assert json.load(f)["positions"] is True
    ph = spark.createDataFrame([(0, "def ident1")], "phrase_id long, text string")
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in phrase_match_counts(spark, out, ph).collect()
    }
    want = {}
    terms = tokenize_text("def ident1")
    for row in corpus_pd.itertuples():
        c = phrase_count(row.content, terms)
        if c:
            want[(0, row.doc_id)] = c
    assert got == want
    # A non-positional checkpoint must NOT satisfy a positional build:
    # params mismatch forces fresh chunks.
    out2 = str(tmp_path / "idx_flagflip")
    kw = dict(bucket_size=32, block_size=16, buckets_per_chunk=2, lineage="v1")
    build_index_resumable(spark, docs_sdf, out2, positions=False, **kw)
    meta = build_index_resumable(spark, docs_sdf, out2, positions=True, **kw)
    assert meta["chunks_fresh_this_run"] > 0 and meta["positions"] is True


def test_lineage_mismatch_forces_rebuild(spark, docs_sdf, tmp_path):
    out = str(tmp_path / "idx_lineage")
    kw = dict(bucket_size=64, block_size=16, buckets_per_chunk=4)
    build_index_resumable(spark, docs_sdf, out, lineage="corpus@v1", **kw)
    m1 = _tree_mtimes(f"{out}/tf/chunk=0")
    # Same lineage → everything reused.
    meta = build_index_resumable(spark, docs_sdf, out, lineage="corpus@v1", **kw)
    assert meta["chunks_fresh_this_run"] == 0
    assert _tree_mtimes(f"{out}/tf/chunk=0") == m1
    # New lineage → chunks rebuilt.
    meta2 = build_index_resumable(spark, docs_sdf, out, lineage="corpus@v2", **kw)
    assert meta2["chunks_fresh_this_run"] > 0
