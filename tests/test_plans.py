"""Physical-plan checks: the plans we'd want at 100 TB, asserted on the
optimized plan text (pushed filters, column pruning, broadcast joins)."""

from __future__ import annotations

import pytest

from dts.index_build import build_index
from dts.score import bm25_topk_dataframe


@pytest.fixture(scope="module")
def small_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    build_index(spark, docs_sdf, d, bucket_size=128)
    return d


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_term_filter_pushed_to_postings_scan(spark, small_index):
    from pyspark.sql import functions as F

    postings = spark.read.parquet(f"{small_index}/postings")
    plan = _plan(postings.filter(F.col("term").isin(["def", "import"])))
    assert "PushedFilters" in plan
    assert "In(term" in plan or "EqualTo(term" in plan, plan


def test_column_pruning_on_docs_scan(spark, small_index):
    from pyspark.sql import functions as F

    postings = spark.read.parquet(f"{small_index}/postings")
    proj = postings.select("term", "df" if "df" in postings.columns else "n")
    plan = _plan(proj)
    # ReadSchema must NOT include the heavy blob columns.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "doc_blob" not in read_schema[0], read_schema


def test_snippet_lookup_pushes_doc_id_filter(spark, docs_sdf, small_index, tmp_path):
    """Round-4 verdict fix: the results-page doc lookup must filter the
    docs scan by the (driver-known) top-k doc_ids — PushedFilters
    In(doc_id, …) — instead of streaming the whole corpus through a
    broadcast join probe."""
    from dts.snippet import search_with_snippets

    docs_dir = str(tmp_path / "docs_pq")
    docs_sdf.select("doc_id", "content").write.parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)
    queries = spark.createDataFrame(
        [(0, "def import", 0)], "query_id long, text string, fuzzy_k int"
    )
    out = search_with_snippets(spark, small_index, docs, queries, k=5)
    plan = _plan(out)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("In(doc_id" in l or "EqualTo(doc_id" in l for l in pushed), plan
    assert out.count() > 0


def test_bm25_plan_broadcasts_query_side(spark, docs_sdf):
    queries = spark.createDataFrame(
        [(0, "def import")], "query_id long, text string"
    )
    out = bm25_topk_dataframe(docs_sdf, queries, k=5)
    # AQE: codegen annotations only appear on the FINAL plan, and only
    # collect() executes THIS _jdf's queryExecution (count() builds a new one).
    out.collect()
    plan = _plan(out)
    # Cache state from earlier tests can change the exact operator names
    # (InMemoryTableScan, AQE query stages) — assert the broadcast strategy
    # itself plus codegen spans, not a specific join operator.
    assert "Broadcast" in plan, plan
    # Formatted explain marks whole-stage-codegen operators with a `*`.
    assert "* Project" in plan or "* Filter" in plan or "* Sort" in plan, plan
