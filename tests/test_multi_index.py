"""Multi-index (MultiReader) search: two half-indexes searched together
must BIT-match one index over the whole corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dts.index_build import build_index
from dts.multi_index import multi_index_topk
from dts.score_index import bm25_topk_indexed


@pytest.fixture(scope="module")
def halves(spark, docs_sdf, tmp_path_factory):
    base = tmp_path_factory.mktemp("mi")
    d_full, d_a, d_b = (str(base / n) for n in ("full", "a", "b"))
    half_a = docs_sdf.filter(F.col("doc_id") % 2 == 0)
    half_b = docs_sdf.filter(F.col("doc_id") % 2 == 1)
    build_index(spark, docs_sdf, d_full, bucket_size=64, block_size=16)
    # different bucket sizes on purpose: geometry must not matter
    build_index(spark, half_a, d_a, bucket_size=32, block_size=16)
    build_index(spark, half_b, d_b, bucket_size=64, block_size=8)
    return d_full, d_a, d_b


def test_multi_index_equals_single(spark, halves, queries_pd):
    d_full, d_a, d_b = halves
    q = spark.createDataFrame(queries_pd.iloc[:5][["query_id", "text"]])
    want = (
        bm25_topk_indexed(spark, d_full, q, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        multi_index_topk(spark, [d_a, d_b], q, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["rank"]) == list(want["rank"])
    assert np.allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
    )


def test_multi_index_single_dir_matches_plain(spark, halves, queries_pd):
    d_full, _, _ = halves
    q = spark.createDataFrame(queries_pd.iloc[:3][["query_id", "text"]])
    want = bm25_topk_indexed(spark, d_full, q, k=8).toPandas()
    got = multi_index_topk(spark, [d_full], q, k=8).toPandas()
    key = ["query_id", "rank"]
    w = want.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert list(g["doc_id"]) == list(w["doc_id"])
    assert np.array_equal(g["score"].to_numpy(), w["score"].to_numpy())


def test_multi_index_doc_bases(spark, halves, queries_pd):
    """Overlapping local ids disambiguate through doc_bases offsets."""
    _, d_a, d_b = halves
    q = spark.createDataFrame(queries_pd.iloc[:2][["query_id", "text"]])
    base = 10**6
    got = multi_index_topk(
        spark, [d_a, d_b], q, k=10, doc_bases=[0, base]
    ).toPandas()
    plain = multi_index_topk(spark, [d_a, d_b], q, k=10).toPandas()
    # offset ids: every hit from index b shifts by base; scores unchanged
    assert set(got["doc_id"]) == {
        d + base if d % 2 == 1 else d for d in plain["doc_id"]
    }
    with pytest.raises(ValueError, match="doc_bases"):
        multi_index_topk(spark, [d_a, d_b], q, doc_bases=[0]).collect()
