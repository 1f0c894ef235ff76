"""Multi-field index: clause routing, per-field stats, weighted merge —
vs a per-field OracleIndex replay (bit-identical scores: two-field sums
are order-independent in IEEE754)."""

from __future__ import annotations

import numpy as np
import pytest

from dts.multifield import (
    bm25_topk_multifield,
    build_multifield_index,
    parse_field_query,
)
from dts.oracle import OracleIndex
from dts.tokenizer import tokenize_text

FIELDS = {"content": 1.0, "path": 2.0}


def test_parse_field_query():
    assert parse_field_query("a path:b c", FIELDS, "content") == {
        "content": "a c", "path": "b",
    }
    assert parse_field_query("path:x path:y", FIELDS, "content") == {"path": "x y"}
    # unknown field prefix and bare colon stay in the default field
    assert parse_field_query("zzz:abc path:", FIELDS, "content") == {
        "content": "zzz:abc path:",
    }


@pytest.fixture(scope="module")
def mf_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mf"))
    build_multifield_index(
        spark, docs_sdf, d, FIELDS, bucket_size=64, block_size=16
    )
    return d


@pytest.fixture(scope="module")
def mf_oracles(corpus_pd):
    ids = corpus_pd["doc_id"].astype(int)
    return {
        "content": OracleIndex(list(zip(ids, corpus_pd["content"]))),
        "path": OracleIndex(list(zip(ids, corpus_pd["path"]))),
    }


def test_multifield_vs_oracle(spark, mf_index, corpus_pd, mf_oracles):
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    cases = [
        (0, f"{ctoks[0]} {ctoks[1]}"),               # default field only
        (1, f"path:{ptoks[0]}"),                       # scoped only
        (2, f"{ctoks[0]} path:{ptoks[-1]}"),           # mixed
        (3, f"path:{ptoks[0]} path:{ptoks[-1]} {ctoks[2]}"),
    ]
    q = spark.createDataFrame(cases, "query_id long, text string")
    got = bm25_topk_multifield(spark, mf_index, q, k=10).toPandas()
    for qid, text in cases:
        total: dict[int, float] = {}
        for f_name, sub in parse_field_query(text, FIELDS, "content").items():
            for _, doc, s in mf_oracles[f_name].score_query(sub, topk=10**9):
                total[doc] = total.get(doc, 0.0) + FIELDS[f_name] * s
        want = sorted(total.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]
        g = got[got["query_id"] == qid].sort_values("rank")
        assert list(g["doc_id"].astype(int)) == [d for d, _ in want], text
        assert np.array_equal(
            g["score"].to_numpy(), np.array([s for _, s in want])
        ), (text, "bit identity")
