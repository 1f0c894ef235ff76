"""Index sorting (sort_index_meta) + early-terminated sorted fetch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dts.docvalues import sort_index_meta, sorted_topk_indexed, sort_topk
from dts.index_build import build_index


@pytest.fixture(scope="module")
def sorted_idx(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sidx"))
    # n_lines has heavy duplication → exercises value-disjoint binning
    docs = docs_sdf.withColumn(
        "val", (F.col("doc_id") * 37 % 101).cast("long")
    ).withColumn("dup", (F.col("doc_id") % 7).cast("long"))
    build_index(
        spark, docs, d, bucket_size=64, block_size=16,
        store_fields=["val", "dup"],
    )
    sort_index_meta(spark, d, "val", n_bins=8)
    sort_index_meta(spark, d, "dup", n_bins=8)
    return d


def _full_sort(spark, idx, field, k, ascending):
    side = spark.read.parquet(f"{idx}/doc_meta").filter(
        F.col(field).isNotNull()
    )
    rows = side.select("doc_id", field).collect()
    rows.sort(
        key=lambda r: (
            (r[field] if ascending else -r[field]), r["doc_id"]
        )
    )
    return [(r["doc_id"], r[field]) for r in rows[:k]]


@pytest.mark.parametrize("field", ["val", "dup"])
@pytest.mark.parametrize("ascending", [True, False])
def test_sorted_fetch_unfiltered(spark, sorted_idx, field, ascending):
    got, bins_read = sorted_topk_indexed(
        spark, sorted_idx, field, k=15, ascending=ascending,
        return_bins_read=True,
    )
    rows = sorted(got.collect(), key=lambda r: r["rank"])
    assert [(r["doc_id"], r[field]) for r in rows] == _full_sort(
        spark, sorted_idx, field, 15, ascending
    )
    assert bins_read < 8  # early termination actually pruned bins


def test_sorted_fetch_filtered_matches(spark, sorted_idx):
    m = spark.createDataFrame(
        [(0, i) for i in range(0, 200, 3)] + [(1, i) for i in range(0, 200, 50)],
        "query_id long, doc_id long",
    )
    got = sorted_topk_indexed(
        spark, sorted_idx, "val", k=5, ascending=True, matches=m
    )
    want = sort_topk(spark, sorted_idx, m, "val", k=5, ascending=True)
    g = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["val"])
        for r in got.collect()
    )
    w = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["val"])
        for r in want.collect()
    )
    assert g == w
    # query 1 has only 4 matches total — exhausting bins must still work
    assert sum(1 for r in got.collect() if r["query_id"] == 1) == 4


def test_sorted_fetch_staleness_guard(spark, sorted_idx, tmp_path):
    import json

    base = f"{sorted_idx}/sorted_meta_val/_bins.json"
    man = json.load(open(base))
    man["revision"] = man["revision"] + 999
    json.dump(man, open(base, "w"))
    with pytest.raises(ValueError, match="rebuild"):
        sorted_topk_indexed(spark, sorted_idx, "val", k=5)
    man["revision"] = man["revision"] - 999
    json.dump(man, open(base, "w"))


def test_sorted_fetch_plan_shows_partition_pruning(spark, sorted_idx):
    """The early-terminated read is PARTITION pruning, not a post-scan
    filter: the FileScan's PartitionFilters carries the bin IN-list and
    DataFilters stays empty — unread bin directories are never opened."""
    got, bins_read = sorted_topk_indexed(
        spark, sorted_idx, "val", k=15, ascending=True,
        return_bins_read=True,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "sorted_meta_val" in ln
    ]
    assert scan_lines, plan
    import re

    assert any(
        re.search(r"PartitionFilters: \[[^\]]*_bin", ln)
        and "DataFilters: []" in ln
        for ln in scan_lines
    ), scan_lines
    assert bins_read < 8


def test_sorted_fetch_unfiltered_distributed_plan(spark, sorted_idx):
    # Round-6: after the manifest prunes the bin prefix, the final top-k
    # is TakeOrderedAndProject over the prefix — no single-partition
    # window sort of the whole prefix; rank windows over the k-row limit.
    df = sorted_topk_indexed(spark, sorted_idx, "val", k=15)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[-1]
