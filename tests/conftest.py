from __future__ import annotations

import pandas as pd
import pytest

from dts.corpus import make_corpus, make_queries
from dts.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dts-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pd() -> pd.DataFrame:
    """Tiny deterministic corpus (FIXTURES.md §1, seed=42) with doc_id
    assigned the oracle way: row_number over (repo, path, commit)."""
    c = make_corpus(n_docs=200, seed=42)
    c = c.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    c["doc_id"] = c.index.astype("int64")
    return c


@pytest.fixture(scope="session")
def queries_pd() -> pd.DataFrame:
    return make_queries(n_queries=30, seed=42)


@pytest.fixture(scope="session")
def docs_sdf(spark, corpus_pd):
    return spark.createDataFrame(corpus_pd).cache()
