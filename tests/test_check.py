"""CheckIndex (dts.check): clean indexes verify at every lifecycle
stage; tampering is detected and strict mode raises."""

from __future__ import annotations

import glob
import os

import pytest

from dts.check import CorruptIndexError, check_index
from dts.index_build import (
    build_index,
    compact_index,
    load_meta,
    merge_index,
    save_meta,
)


@pytest.fixture(scope="module")
def chk_idx(spark, corpus_pd, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chk") / "idx")
    docs = spark.createDataFrame(corpus_pd.head(120)).withColumn(
        "key", __import__("pyspark.sql.functions", fromlist=["F"]).concat_ws(
            "-", "repo", "path"
        ),
    )
    build_index(
        spark, docs, d, bucket_size=32, block_size=8,
        store_fields=["key"], store_term_vectors=True,
    )
    return d


def test_check_clean_index_ok(spark, chk_idx):
    rep = check_index(spark, chk_idx, strict=True)
    assert rep["ok"] == 1
    assert rep["term_stats_agreement"] == 0
    assert rep["bmw_bound"] == 0
    assert rep["term_vectors_dl"] == 0


def test_check_survives_lifecycle(spark, corpus_pd, tmp_path):
    from dts.delete import delete_docs

    d = str(tmp_path / "life_idx")
    build_index(
        spark, spark.createDataFrame(corpus_pd.head(80)), d,
        bucket_size=32, store_term_vectors=True,
    )
    merge_index(
        spark, d,
        spark.createDataFrame(
            corpus_pd.iloc[80:120].drop(columns=["doc_id"])
        ),
    )
    assert check_index(spark, d)["ok"] == 1  # post-merge
    delete_docs(spark, d, [3, 9, 81])
    assert check_index(spark, d)["ok"] == 1  # tombstones don't corrupt
    compact_index(spark, d)
    assert check_index(spark, d, strict=True)["ok"] == 1  # post-compact


def test_check_detects_meta_tamper(spark, chk_idx, tmp_path):
    import shutil

    d = str(tmp_path / "tampered")
    shutil.copytree(chk_idx, d)
    meta = load_meta(d)
    meta["n_docs"] += 5
    save_meta(d, meta)
    rep = check_index(spark, d)
    assert rep["doc_stats_n_docs"] == 1 and rep["ok"] == 0
    with pytest.raises(CorruptIndexError):
        check_index(spark, d, strict=True)


def test_check_detects_lost_postings_file(spark, chk_idx, tmp_path):
    import shutil

    d = str(tmp_path / "lost")
    shutil.copytree(chk_idx, d)
    parts = sorted(glob.glob(f"{d}/postings/*.parquet"))
    assert parts
    os.remove(parts[0])
    rep = check_index(spark, d)
    # one-of-many lost → term_stats disagree; sole-file lost → unreadable
    assert rep["ok"] == 0
    assert rep.get("term_stats_agreement", 0) > 0 or rep["postings_readable"] == 1
