"""Streaming semantics = batch semantics (AvailableNow drain vs the same
plan run in batch) over the driver's events table."""

from __future__ import annotations

import shutil

import pytest

from dts.streaming import (
    run_stream_to_memory,
    session_windows,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(src, d / "part-0.parquet")
    return str(d)


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    want = _norm(windowed_counts(batch))
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got = _norm(
        run_stream_to_memory(windowed_counts(stream), "wc_test", spark)
    )
    assert got == want and len(got) > 0


def test_session_windows_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    want = _norm(session_windows(batch))
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got = _norm(
        run_stream_to_memory(session_windows(stream), "sw_test", spark)
    )
    assert got == want and len(got) > 0


def test_stream_ingest_index(spark, corpus_pd, tmp_path):
    """Streamed build: wave-1 creates the index, wave-2 merges in a second
    availableNow drain of the SAME checkpoint; results equal the batch
    oracle over the full corpus (streamed doc_ids coincide with the
    conftest assignment because each wave arrives in natural-key order).
    A third drain with no new files must be a no-op."""
    import numpy as np

    from dts.index_build import load_meta
    from dts.oracle import OracleIndex
    from dts.score_index import bm25_topk_indexed
    from dts.streaming import stream_ingest_index
    from dts.tokenizer import tokenize_text

    land, idx, ck = str(tmp_path / "land"), str(tmp_path / "idx"), str(tmp_path / "ck")
    wave1 = corpus_pd.head(120).drop(columns=["doc_id"])
    wave2 = corpus_pd.iloc[120:].drop(columns=["doc_id"])
    schema = spark.createDataFrame(wave1).schema

    spark.createDataFrame(wave1).coalesce(1).write.mode("append").parquet(land)
    stream_ingest_index(
        spark, land, idx, schema, ck, bucket_size=64
    ).awaitTermination()
    assert load_meta(idx)["n_docs"] == 120

    spark.createDataFrame(wave2).coalesce(1).write.mode("append").parquet(land)
    stream_ingest_index(
        spark, land, idx, schema, ck, bucket_size=64
    ).awaitTermination()
    meta = load_meta(idx)
    assert meta["n_docs"] == len(corpus_pd)
    batch_after_waves = meta["last_stream_batch"]

    # no new files → no-op drain
    stream_ingest_index(
        spark, land, idx, schema, ck, bucket_size=64
    ).awaitTermination()
    meta = load_meta(idx)
    assert meta["n_docs"] == len(corpus_pd)
    assert meta["last_stream_batch"] == batch_after_waves

    oracle = OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )
    texts = [
        " ".join(tokenize_text(r["content"])[:3])
        for _, r in corpus_pd.head(5).iterrows()
    ]
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in enumerate(texts)],
        "query_id long, text string, fuzzy_k int",
    )
    got = bm25_topk_indexed(spark, idx, q, k=10, strategy="taat").toPandas()
    for i, text in enumerate(texts):
        want = oracle.score_query(text, topk=10)
        g = got[got["query_id"] == i].sort_values("rank")
        assert list(g["doc_id"].astype(int)) == [d for _, d, _ in want], text
        assert np.array_equal(
            g["score"].to_numpy(), np.array([s for *_, s in want])
        ), text


def test_stream_distinct_docs(spark, corpus_pd, tmp_path):
    """Exact streaming dedup: first arrival of each hash wins within a
    batch, across batches, AND across query restarts (state recovery from
    the checkpoint)."""
    import hashlib

    import pandas as pd

    from dts.streaming import stream_distinct_docs

    land, ck, out = str(tmp_path / "l"), str(tmp_path / "c"), str(tmp_path / "o")
    base = corpus_pd.head(60)[["content"]].copy()
    base["content_md5"] = base["content"].map(
        lambda c: hashlib.md5(c.encode()).hexdigest()
    )
    wave1 = pd.concat([base.head(40), base.head(10)])  # internal dups
    spark.createDataFrame(wave1).coalesce(1).write.mode("append").parquet(land)
    schema = spark.createDataFrame(base).schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(land)
        q = (
            stream_distinct_docs(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    got1 = drain().toPandas()
    # in-batch dups collapsed (incl. the corpus' own duplicate contents)
    assert len(got1) == base.head(40)["content_md5"].nunique()
    assert set(got1["content_md5"]) == set(base.head(40)["content_md5"])

    # wave 2: 20 repeats of wave-1 hashes (must be suppressed by RESTORED
    # state in a NEW query) + 20 fresh docs
    wave2 = pd.concat([base.head(20), base.tail(20)])
    spark.createDataFrame(wave2).coalesce(1).write.mode("append").parquet(land)
    got2 = drain().toPandas()
    assert len(got2) == base["content_md5"].nunique()
    assert set(got2["content_md5"]) == set(base["content_md5"])
