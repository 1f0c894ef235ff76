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
