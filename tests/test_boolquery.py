"""Boolean MUST/MUST_NOT matching vs a python set oracle, including the
merged-index (multiple posting rows per slot) and same-term-both-sides
edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dts.boolquery import boolean_match_docs
from dts.index_build import build_index, merge_index
from dts.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def bool_index(spark, docs_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bool_index"))
    build_index(spark, docs_sdf, d, bucket_size=64, block_size=16)
    return d


def _py_oracle(corpus_pd, must: str, must_not: str) -> set[int]:
    m = set(tokenize_text(must))
    n = set(tokenize_text(must_not))
    out = set()
    for _, r in corpus_pd.iterrows():
        toks = set(tokenize_text(r["content"]))
        if m <= toks and not (n & toks):
            out.add(int(r["doc_id"]))
    return out


def _terms_from(corpus_pd, seed: int, n: int) -> list[str]:
    rng = np.random.RandomState(seed)
    toks = tokenize_text(" ".join(corpus_pd["content"].head(40)))
    return [toks[rng.randint(len(toks))] for _ in range(n)]


def test_boolean_vs_oracle(spark, bool_index, corpus_pd):
    ts = _terms_from(corpus_pd, seed=11, n=12)
    cases = [
        (0, f"{ts[0]}", ""),
        (1, f"{ts[1]} {ts[2]}", ""),
        (2, f"{ts[3]} {ts[4]}", f"{ts[5]}"),
        (3, f"{ts[6]}", f"{ts[7]} {ts[8]}"),
        (4, f"{ts[9]} {ts[10]} {ts[11]}", ""),
        (5, f"{ts[0]}", f"{ts[0]}"),  # +t -t: must yield nothing
        (6, "zzzabsent", ""),  # term not in vocabulary
    ]
    q = spark.createDataFrame(cases, "bq_id long, must string, must_not string")
    got = boolean_match_docs(spark, bool_index, q).toPandas()
    by_q = {
        int(b): set(g["doc_id"].astype(int)) for b, g in got.groupby("bq_id")
    }
    nonempty = 0
    for bq_id, must, must_not in cases:
        want = _py_oracle(corpus_pd, must, must_not)
        if bq_id == 5:
            want = set()
        assert by_q.get(bq_id, set()) == want, f"case {bq_id}"
        nonempty += bool(want)
    assert nonempty >= 3  # the sampled cases actually exercise matching


def test_boolean_survives_merge(spark, bool_index, corpus_pd, tmp_path):
    """After an incremental merge a slot has multiple posting rows per
    bucket; set algebra must treat them as one concatenated run."""
    import shutil

    d = str(tmp_path / "merged")
    shutil.copytree(bool_index, d)
    extra = corpus_pd.head(30).drop(columns=["doc_id"])
    merge_index(spark, d, spark.createDataFrame(extra))
    ts = _terms_from(corpus_pd, seed=23, n=4)
    q = spark.createDataFrame(
        [(0, f"{ts[0]} {ts[1]}", f"{ts[2]}")],
        "bq_id long, must string, must_not string",
    )
    got = set(
        boolean_match_docs(spark, d, q).toPandas()["doc_id"].astype(int)
    )
    # oracle over the merged corpus: appended docs get ids base + row order
    base = len(corpus_pd)
    merged = pd.concat(
        [
            corpus_pd,
            extra.assign(doc_id=np.arange(base, base + len(extra))),
        ],
        ignore_index=True,
    )
    want = _py_oracle(merged, f"{ts[0]} {ts[1]}", f"{ts[2]}")
    assert got == want


def test_pure_negation_rejected(spark, bool_index):
    q = spark.createDataFrame(
        [(0, "", "anything")], "bq_id long, must string, must_not string"
    )
    with pytest.raises(ValueError, match="must"):
        boolean_match_docs(spark, bool_index, q)


def _py_oracle_should(
    corpus_pd, must: str, should: str, must_not: str, msm: int | None
) -> set[int]:
    m = set(tokenize_text(must))
    s = set(tokenize_text(should))
    n = set(tokenize_text(must_not))
    if msm is None:
        msm = 0 if m else 1
    if not m and s and msm < 1:
        msm = 1
    out = set()
    for _, r in corpus_pd.iterrows():
        toks = set(tokenize_text(r["content"]))
        if m <= toks and not (n & toks) and len(s & toks) >= msm:
            out.add(int(r["doc_id"]))
    return out


def test_should_minimum_should_match_vs_oracle(spark, bool_index, corpus_pd):
    """Round-4 BooleanQuery completion: SHOULD + minimum_should_match —
    Lucene defaults (msm 0 with MUST, 1 without), SHOULD-only counted
    union, msm floors, composition with MUST/MUST_NOT."""
    ts = _terms_from(corpus_pd, seed=23, n=12)
    cases = [
        # (must, should, must_not, msm)
        (f"{ts[0]}", f"{ts[1]} {ts[2]}", "", None),          # msm→0
        (f"{ts[0]}", f"{ts[1]} {ts[2]} {ts[3]}", "", 2),     # must + msm=2
        ("", f"{ts[4]} {ts[5]}", "", None),                  # should-only → msm=1
        ("", f"{ts[1]} {ts[2]} {ts[6]}", "", 2),             # should-only msm=2
        ("", f"{ts[7]} {ts[8]}", f"{ts[0]}", 1),             # should + not
        ("", f"{ts[3]} {ts[9]}", "", 0),                     # msm=0 floored to 1
        (f"{ts[0]} {ts[1]}", f"{ts[2]}", f"{ts[10]}", 1),    # all three roles
        ("", f"{ts[4]} {ts[5]} {ts[6]}", "", 5),             # msm > |should| ⇒ ∅
    ]
    q = spark.createDataFrame(
        [(i, m, n, s, msm) for i, (m, s, n, msm) in enumerate(cases)],
        "bq_id long, must string, must_not string, should string, msm int",
    )
    got_df = boolean_match_docs(spark, bool_index, q).toPandas()
    got = {
        int(i): set(g["doc_id"].astype(int)) for i, g in got_df.groupby("bq_id")
    }
    for i, (m, s, n, msm) in enumerate(cases):
        want = _py_oracle_should(corpus_pd, m, s, n, msm)
        assert got.get(i, set()) == want, (i, m, s, n, msm)
    assert got.get(7, set()) == set()  # unreachable msm


def test_should_backward_compat_no_column(spark, bool_index, corpus_pd):
    """Queries without a should column behave exactly as before."""
    ts = _terms_from(corpus_pd, seed=11, n=4)
    q = spark.createDataFrame(
        [(0, f"{ts[0]} {ts[1]}", ts[2])],
        "bq_id long, must string, must_not string",
    )
    got = {
        int(r["doc_id"])
        for r in boolean_match_docs(spark, bool_index, q).collect()
    }
    assert got == _py_oracle(corpus_pd, f"{ts[0]} {ts[1]}", ts[2])


@pytest.fixture(scope="module")
def ts_index(spark, docs_sdf, tmp_path_factory):
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("terms_set_idx"))
    src = docs_sdf.withColumn(
        "prio", (F.col("doc_id") % 4).cast("long")
    )
    build_index(
        spark, src, d, bucket_size=64, block_size=16, store_fields=["prio"]
    )
    return d


def test_terms_set_vs_oracle(spark, ts_index, corpus_pd):
    from dts.boolquery import terms_set_match

    ts = _terms_from(corpus_pd, seed=23, n=6)
    q = spark.createDataFrame(
        [(0, " ".join(ts[:4])), (1, " ".join(ts[2:]))],
        "tq_id long, terms string",
    )
    got = {
        (r.tq_id, r.doc_id): r.n_matched
        for r in terms_set_match(spark, ts_index, q, "prio").collect()
    }
    want = {}
    for tq_id, terms in ((0, ts[:4]), (1, ts[2:])):
        tset = set(terms)
        for _, r in corpus_pd.iterrows():
            n = len(tset & set(tokenize_text(r["content"])))
            msm = max(1, int(r.name) % 4)  # prio = doc_id % 4, clamped
            if n >= msm:
                want[(tq_id, int(r["doc_id"]))] = n
    assert got == want
    assert want  # non-vacuous


def test_terms_set_msm_expr_and_clamp(spark, ts_index, corpus_pd):
    """msm_expr overrides the field; minima < 1 clamp to 1 (docs with
    prio=0 still need one match — never match-all)."""
    from dts.boolquery import terms_set_match

    ts = _terms_from(corpus_pd, seed=29, n=3)
    q = spark.createDataFrame([(0, " ".join(ts))], "tq_id long, terms string")
    got0 = {
        r.doc_id
        for r in terms_set_match(
            spark, ts_index, q, "prio", msm_expr="prio - 10"
        ).collect()
    }
    # clamped minimum 1 for every doc == "any term present"
    tset = set(ts)
    want0 = {
        int(r["doc_id"])
        for _, r in corpus_pd.iterrows()
        if tset & set(tokenize_text(r["content"]))
    }
    assert got0 == want0

    with pytest.raises(ValueError, match="no terms"):
        terms_set_match(
            spark,
            ts_index,
            spark.createDataFrame([(9, "")], "tq_id long, terms string"),
            "prio",
        )
