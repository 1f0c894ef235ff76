"""Snapshots (dts.snapshot): point-in-time isolation from subsequent
mutations, restore round-trip, stats, corruption refusal."""

from __future__ import annotations

import json
import os

import pytest

from dts.index_build import build_index, compact_index, merge_index
from dts.snapshot import index_stats, restore_index, snapshot_index


def _top(spark, idx, text, k=10):
    from dts.score_index import bm25_topk_indexed

    q = spark.createDataFrame(
        [(0, text, 0)], "query_id long, text string, fuzzy_k int"
    )
    return sorted(
        (int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 9))
        for r in bm25_topk_indexed(spark, idx, q, k=k).collect()
    )


def test_snapshot_isolated_from_mutations(spark, corpus_pd, tmp_path):
    from dts.check import check_index
    from dts.delete import delete_docs
    from dts.tokenizer import tokenize_text

    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(corpus_pd.head(120)), idx,
        bucket_size=32,
    )
    text = " ".join(tokenize_text(corpus_pd["content"].iloc[0])[:2])
    before = _top(spark, idx, text)

    snap = str(tmp_path / "snap")
    man = snapshot_index(idx, snap)
    assert man["files"] and man["stats"]["n_docs"] == 120

    # mutate the original THREE ways
    delete_docs(spark, idx, [int(before[0][1])])
    compact_index(spark, idx)
    merge_index(
        spark, idx,
        spark.createDataFrame(
            corpus_pd.iloc[120:160].drop(columns=["doc_id"])
        ),
    )
    assert _top(spark, idx, text) != before  # original moved on
    assert _top(spark, snap, text) == before  # snapshot froze the commit
    assert check_index(spark, snap, strict=True)["ok"] == 1

    # restore is a working, equal index
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    assert _top(spark, dest, text) == before
    # and independently mutable
    delete_docs(spark, dest, [int(before[-1][1])])
    assert _top(spark, snap, text) == before


def test_snapshot_refusals_and_stats(spark, corpus_pd, tmp_path):
    idx = str(tmp_path / "idx2")
    build_index(
        spark, spark.createDataFrame(corpus_pd.head(30)), idx, bucket_size=16
    )
    st = index_stats(idx)
    assert st["n_docs"] == 30 and st["bytes_total"] > 0
    assert "postings" in st["bytes_by_component"]

    snap = str(tmp_path / "snap2")
    snapshot_index(idx, snap)
    with pytest.raises(ValueError, match="not empty"):
        snapshot_index(idx, snap)
    with pytest.raises(ValueError, match="no _snapshot.json"):
        restore_index(idx, str(tmp_path / "x"))
    # corrupt manifest size -> refuse restore
    man_path = os.path.join(snap, "_snapshot.json")
    man = json.load(open(man_path))
    k0 = next(iter(man["files"]))
    man["files"][k0] += 1
    json.dump(man, open(man_path, "w"))
    with pytest.raises(ValueError, match="corrupt"):
        restore_index(snap, str(tmp_path / "y"))
