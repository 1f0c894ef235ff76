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


def _mf_cases(corpus_pd):
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    return [
        (0, f"{ctoks[0]} {ctoks[1]}"),               # default field only
        (1, f"path:{ptoks[0]}"),                       # scoped only
        (2, f"{ctoks[0]} path:{ptoks[-1]}"),           # mixed
        (3, f"path:{ptoks[0]} path:{ptoks[-1]} {ctoks[2]}"),
    ]


@pytest.mark.parametrize("distribute", ["query", "bucket", "fused"])
def test_multifield_vs_oracle(spark, mf_index, corpus_pd, mf_oracles, distribute):
    cases = _mf_cases(corpus_pd)
    q = spark.createDataFrame(cases, "query_id long, text string")
    got = bm25_topk_multifield(
        spark, mf_index, q, k=10, distribute=distribute
    ).toPandas()
    for qid, text in cases:
        total: dict[int, float] = {}
        for f_name, sub in parse_field_query(text, FIELDS, "content").items():
            for _, doc, s in mf_oracles[f_name].score_query(sub, topk=10**9):
                total[doc] = total.get(doc, 0.0) + FIELDS[f_name] * s
        want = sorted(total.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]
        g = got[got["query_id"] == qid].sort_values("rank")
        assert list(g["doc_id"].astype(int)) == [d for d, _ in want], (
            distribute, text,
        )
        assert np.array_equal(
            g["score"].to_numpy(), np.array([s for _, s in want])
        ), (distribute, text, "bit identity")


def test_multifield_bucket_rank_identical_to_query_path(
    spark, mf_index, corpus_pd
):
    """Round-4 verdict fix: the bounded per-(query, shard) merge must be
    rank-identical to the full-candidate query path, and its plan must
    run local top-k in shard-partitioned windows (no unbounded
    single-partition window over all candidates)."""
    cases = _mf_cases(corpus_pd)
    q = spark.createDataFrame(cases, "query_id long, text string")
    a = bm25_topk_multifield(
        spark, mf_index, q, k=10, distribute="query"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    bdf = bm25_topk_multifield(spark, mf_index, q, k=10, distribute="bucket")
    b = bdf.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "doc_id", "rank"]].equals(
        b[["query_id", "doc_id", "rank"]]
    )
    assert np.allclose(a["score"], b["score"], rtol=0, atol=1e-12)
    # Plan: the first (local) window partitions by (query_id, shard) —
    # bounded groups; only the tiny k×shards merge windows by query alone.
    plan = bdf._jdf.queryExecution().optimizedPlan().toString()
    assert "shard" in plan, plan


def test_multifield_auto_distribute_and_empty(spark, mf_index, corpus_pd):
    """Auto mode picks a path by bucket count; an all-unroutable batch
    yields an empty engine-standard frame."""
    q = spark.createDataFrame(
        [(0, _mf_cases(corpus_pd)[0][1])], "query_id long, text string"
    )
    out = bm25_topk_multifield(spark, mf_index, q, k=5)
    assert out.count() > 0
    empty = bm25_topk_multifield(
        spark, mf_index,
        spark.createDataFrame([], "query_id long, text string"), k=5,
    )
    assert empty.count() == 0


# ---- round-5: unified grammar over multifield (search_fields) ----------


@pytest.fixture(scope="module")
def mfp_index(spark, docs_sdf, tmp_path_factory):
    """Positional multifield index (field-scoped phrases need positions)."""
    d = str(tmp_path_factory.mktemp("mfp"))
    build_multifield_index(
        spark, docs_sdf, d, FIELDS, bucket_size=64, block_size=16,
        positions=True,
    )
    return d


def _expect_mf(mf_oracles, scoring, eligible=None, k=10):
    """Reference ranking: Σ_field boost·BM25_f over ``scoring`` (field →
    term list), restricted to ``eligible`` doc ids."""
    total: dict[int, float] = {}
    for f_name, terms in scoring.items():
        if not terms:
            continue
        for _, doc, s in mf_oracles[f_name].score_terms(terms, topk=10**9):
            total[doc] = total.get(doc, 0.0) + FIELDS[f_name] * s
    items = [
        (d, s) for d, s in total.items()
        if eligible is None or d in eligible
    ]
    return sorted(items, key=lambda kv: (-round(kv[1], 9), kv[0]))[:k]


def _field_toksets(corpus_pd, col):
    return {
        int(d): set(tokenize_text(t))
        for d, t in zip(corpus_pd["doc_id"], corpus_pd[col])
    }


def test_search_fields_plain_equals_multifield(spark, mfp_index, corpus_pd):
    """Unmodified routed queries through the unified grammar must be
    rank-identical to bm25_topk_multifield's manual composition."""
    from dts.parser import search_fields

    cases = _mf_cases(corpus_pd)
    got = (
        search_fields(spark, mfp_index, [t for _, t in cases], k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    q = spark.createDataFrame(cases, "query_id long, text string")
    ref = (
        bm25_topk_multifield(spark, mfp_index, q, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "doc_id", "rank"]].values.tolist() == (
        ref[["query_id", "doc_id", "rank"]].values.tolist()
    )
    assert np.allclose(got["score"], ref["score"], rtol=0, atol=0)


def test_search_fields_must_and_not(spark, mfp_index, corpus_pd, mf_oracles):
    """The verdict's example shape: 'path:util +parse' — scoped scoring +
    cross-field MUST; plus a field-scoped exclusion."""
    from dts.parser import search_fields

    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    c_sets = _field_toksets(corpus_pd, "content")
    p_sets = _field_toksets(corpus_pd, "path")

    q1 = f"path:{ptoks[0]} +{ctoks[1]}"
    q2 = f"{ctoks[0]} -path:{ptoks[0]}"
    q3 = f"{ctoks[0]} +path:{ptoks[0]}"
    got = (
        search_fields(spark, mfp_index, [q1, q2, q3], k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    want1 = _expect_mf(
        mf_oracles,
        {"path": [ptoks[0]], "content": [ctoks[1]]},
        {d for d, s in c_sets.items() if ctoks[1] in s},
    )
    want2 = _expect_mf(
        mf_oracles,
        {"content": [ctoks[0]]},
        {d for d, s in p_sets.items() if ptoks[0] not in s},
    )
    want3 = _expect_mf(
        mf_oracles,
        {"content": [ctoks[0]], "path": [ptoks[0]]},
        {d for d, s in p_sets.items() if ptoks[0] in s},
    )
    for qid, want in [(0, want1), (1, want2), (2, want3)]:
        g = got[got["query_id"] == qid]
        assert list(g["doc_id"].astype(int)) == [d for d, _ in want], qid
        assert np.array_equal(
            g["score"].to_numpy(), np.array([s for _, s in want])
        ), qid


def test_search_fields_scoped_phrase_and_wildcard(
    spark, mfp_index, corpus_pd, mf_oracles
):
    from dts.oracle import phrase_count
    from dts.parser import search_fields

    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    phrase = f"{ptoks[0]} {ptoks[1]}"
    q1 = f'{ctoks[0]} path:"{phrase}"'
    prefix = ptoks[0][:2]
    q2 = f"{ctoks[0]} path:{prefix}*"
    got = (
        search_fields(spark, mfp_index, [q1, q2], k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    eligible1 = {
        int(d)
        for d, t in zip(corpus_pd["doc_id"], corpus_pd["path"])
        if phrase_count(t, phrase.split(" ")) > 0
    }
    want1 = _expect_mf(
        mf_oracles,
        {"content": [ctoks[0]], "path": [ptoks[0], ptoks[1]]},
        eligible1,
    )
    g1 = got[got["query_id"] == 0]
    assert list(g1["doc_id"].astype(int)) == [d for d, _ in want1]
    assert np.array_equal(
        g1["score"].to_numpy(), np.array([s for _, s in want1])
    )
    exp = sorted(mf_oracles["path"].wildcard_expand(f"{prefix}*"))
    want2 = _expect_mf(
        mf_oracles, {"content": [ctoks[0]], "path": exp}
    )
    g2 = got[got["query_id"] == 1]
    assert list(g2["doc_id"].astype(int)) == [d for d, _ in want2]


def test_search_fields_required_missing_term_kills_query(
    spark, mfp_index, corpus_pd
):
    from dts.parser import search_fields

    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    out = search_fields(
        spark, mfp_index, [f"{ctoks[0]} +path:zzqqnothere"], k=10
    )
    assert out.count() == 0


def test_multifield_fused_bmw_rank_identical(spark, mf_index, corpus_pd):
    """Round-5 verdict #6: the fused kernel with strategy='bmw' runs ONE
    block-max WAND walk across all fields' cursors (per-cursor
    boost·idf, avgdl) — rank-identical to the taat paths at the round-9
    key, scores equal to 1e-9."""
    cases = _mf_cases(corpus_pd)
    q = spark.createDataFrame(cases, "query_id long, text string")
    a = bm25_topk_multifield(
        spark, mf_index, q, k=10, distribute="query"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = bm25_topk_multifield(
        spark, mf_index, q, k=10, distribute="fused", strategy="bmw"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "doc_id", "rank"]].values.tolist() == (
        b[["query_id", "doc_id", "rank"]].values.tolist()
    )
    assert np.allclose(a["score"], b["score"], rtol=0, atol=1e-9)


def test_multifield_fused_respects_tombstones(spark, docs_sdf, corpus_pd, tmp_path):
    """Per-field tombstones in the fused kernel: a doc deleted in ONE
    field loses only that field's contribution (both strategies)."""
    from dts.delete import delete_docs

    d = str(tmp_path / "mf_del")
    build_multifield_index(
        spark, docs_sdf, d, FIELDS, bucket_size=64, block_size=16
    )
    cases = _mf_cases(corpus_pd)
    q = spark.createDataFrame(cases, "query_id long, text string")
    # Delete a handful of docs from the PATH sub-index only.
    dead = [0, 4, 8, 12]
    delete_docs(spark, f"{d}/field=path", dead)
    ref = bm25_topk_multifield(
        spark, d, q, k=10, distribute="bucket"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    for strat in ("taat", "bmw"):
        got = bm25_topk_multifield(
            spark, d, q, k=10, distribute="fused", strategy=strat
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert got[["query_id", "doc_id", "rank"]].values.tolist() == (
            ref[["query_id", "doc_id", "rank"]].values.tolist()
        ), strat
        assert np.allclose(got["score"], ref["score"], rtol=0, atol=1e-9), strat


def test_search_fields_fused_identical_to_candidates(
    spark, mfp_index, corpus_pd
):
    """Round-5 late session: the one-job fused kernel for the unified
    grammar (multifield.fused_flags_topk) must be rank-identical to the
    per-field candidates + hash-agg path across every query shape —
    scoped MUST/MUST_NOT, field-scoped phrases, wildcards, and a
    required term whose expansion is empty."""
    from dts.parser import search_fields

    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    phrase = f"{ptoks[0]} {ptoks[1]}"
    queries = [
        f"{ctoks[0]} {ctoks[1]}",
        f"path:{ptoks[0]} +{ctoks[1]}",
        f"{ctoks[0]} -path:{ptoks[0]}",
        f'{ctoks[0]} path:"{phrase}"',
        f'+{ctoks[0]} -"{ctoks[1]} {ctoks[2]}" path:{ptoks[0][:2]}*',
        f"{ctoks[0]} +path:zzqqnothere",
    ]
    a = (
        search_fields(spark, mfp_index, queries, k=10, distribute="candidates")
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search_fields(spark, mfp_index, queries, k=10, distribute="fused")
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert a[["query_id", "doc_id", "rank"]].values.tolist() == (
        b[["query_id", "doc_id", "rank"]].values.tolist()
    )
    assert np.allclose(a["score"], b["score"], rtol=0, atol=1e-9)


def test_search_fields_fused_respects_tombstones(
    spark, docs_sdf, corpus_pd, tmp_path
):
    """Fused unified-grammar kernel over an index with per-field
    tombstones: a doc deleted in ONE field loses that field's score AND
    its clause memberships there (required/excluded sets mask dead docs
    exactly like the candidates path)."""
    from dts.delete import delete_docs
    from dts.parser import search_fields

    d = str(tmp_path / "mfp_del")
    build_multifield_index(
        spark, docs_sdf, d, FIELDS, bucket_size=64, block_size=16,
        positions=True,
    )
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    queries = [
        f"{ctoks[0]} +path:{ptoks[0]}",
        f"{ctoks[0]} -path:{ptoks[0]}",
        f'{ctoks[0]} path:"{ptoks[0]} {ptoks[1]}"',
    ]
    delete_docs(spark, f"{d}/field=path", [0, 4, 8, 12])
    a = (
        search_fields(spark, d, queries, k=10, distribute="candidates")
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search_fields(spark, d, queries, k=10, distribute="fused")
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert a[["query_id", "doc_id", "rank"]].values.tolist() == (
        b[["query_id", "doc_id", "rank"]].values.tolist()
    )
    assert np.allclose(a["score"], b["score"], rtol=0, atol=1e-9)


def test_search_fields_dismax(spark, mfp_index, corpus_pd):
    """DisMax cross-field combine: both distribute paths agree, the
    per-doc score equals max + tie·(sum − max) over the per-field sums,
    and tie_breaker=1.0 degenerates to the sum combine."""
    import numpy as np

    from dts.parser import search_fields

    cases = [t for _, t in _mf_cases(corpus_pd)]
    tie = 0.3
    a = (
        search_fields(
            spark, mfp_index, cases, k=10**6, default_field="content",
            combine="dismax", tie_breaker=tie, distribute="fused",
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    b = (
        search_fields(
            spark, mfp_index, cases, k=10**6, default_field="content",
            combine="dismax", tie_breaker=tie, distribute="candidates",
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy())

    # per-field reference for the mixed query (index 2)
    mixed = cases[2]
    c_part, p_part = mixed.split(" ")[0], mixed.split(":")[1]
    sc = (
        search_fields(spark, mfp_index, [c_part], k=10**6,
                      default_field="content")
        .toPandas().set_index("doc_id")["score"]
    )
    sp = (
        search_fields(spark, mfp_index, [f"path:{p_part}"], k=10**6,
                      default_field="content")
        .toPandas().set_index("doc_id")["score"]
    )
    got = a[a["query_id"] == 2].set_index("doc_id")["score"]
    for did in got.index:
        st, ss = float(sc.get(did, 0.0)), float(sp.get(did, 0.0))
        assert np.isclose(got[did], max(st, ss) + tie * (st + ss - max(st, ss)))

    t1 = (
        search_fields(
            spark, mfp_index, cases, k=10**6, default_field="content",
            combine="dismax", tie_breaker=1.0,
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
    )
    t2 = (
        search_fields(
            spark, mfp_index, cases, k=10**6, default_field="content",
            combine="sum",
        )
        .toPandas()
        .sort_values(["query_id", "doc_id"])
    )
    assert list(t1["doc_id"]) == list(t2["doc_id"])
    assert np.allclose(t1["score"].to_numpy(), t2["score"].to_numpy())

    with pytest.raises(ValueError, match="combine"):
        search_fields(spark, mfp_index, cases, combine="best")


def test_cross_fields_vs_replay(spark, mf_index, corpus_pd):
    """ES multi_match type=cross_fields (term-centric blended df): full
    Python replay — per term, blended df = max over fields, per-doc
    dismax with tie_breaker across boosted per-field scores, sum over
    clauses — matches the engine for every (query, doc)."""
    import math
    from collections import Counter

    from dts.multifield import cross_fields_topk

    tie = 0.4
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    queries = [
        (0, f"{ctoks[0]} {ptoks[0]}"),
        (1, f"{ctoks[1]} {ctoks[2]}"),
        (2, "zzqqxx"),
    ]
    q = spark.createDataFrame(queries, "query_id long, text string")
    got = cross_fields_topk(
        spark, mf_index, q, k=10**6, tie_breaker=tie
    ).collect()

    N = len(corpus_pd)

    def stats(col):
        tf: dict[str, dict[int, int]] = {}
        dl: dict[int, int] = {}
        for _, r in corpus_pd.iterrows():
            toks = tokenize_text(r[col])
            dl[int(r["doc_id"])] = len(toks)
            for t, c in Counter(toks).items():
                tf.setdefault(t, {})[int(r["doc_id"])] = c
        return tf, dl, sum(dl.values()) / N

    st = {f: stats(f) for f in FIELDS}
    K1, Bp = 1.2, 0.75

    def idf(df):
        return math.log(1 + (N - df + 0.5) / (df + 0.5))

    exp: dict[tuple[int, int], float] = {}
    for qid, text in queries:
        for t in tokenize_text(text):
            dfb = max(len(st[f][0].get(t, {})) for f in FIELDS)
            if dfb == 0:
                continue
            per_doc: dict[int, list[float]] = {}
            for f, boost in FIELDS.items():
                tf, dl, avgdl = st[f]
                for did, c in tf.get(t, {}).items():
                    s = (
                        boost * idf(dfb) * c * (K1 + 1)
                        / (c + K1 * (1 - Bp + Bp * dl[did] / avgdl))
                    )
                    per_doc.setdefault(did, []).append(s)
            for did, ss in per_doc.items():
                tsc = max(ss) + tie * (sum(ss) - max(ss))
                exp[(qid, did)] = exp.get((qid, did), 0.0) + tsc
    gotmap = {(int(r["query_id"]), int(r["doc_id"])): float(r["score"]) for r in got}
    assert set(gotmap) == set(exp)
    for key in exp:
        assert np.isclose(gotmap[key], exp[key], rtol=1e-9), key


def test_cross_fields_identical_fields_collapse(
    spark, docs_sdf, corpus_pd, tmp_path_factory
):
    """With two IDENTICAL fields and tie_breaker=1 (pure sum), the blend
    is a no-op and cross_fields degenerates to (b1+b2)·single-field BM25
    — pinned against the OracleIndex replay."""
    from pyspark.sql import functions as F

    from dts.multifield import cross_fields_topk

    d = str(tmp_path_factory.mktemp("cfid"))
    docs2 = docs_sdf.withColumn("copy", F.col("content"))
    build_multifield_index(
        spark, docs2.select("doc_id", "content", "copy", "repo", "path", "commit"),
        d, {"content": 1.0, "copy": 2.0}, bucket_size=64, block_size=16,
    )
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    text = f"{ctoks[0]} {ctoks[3]}"
    q = spark.createDataFrame([(0, text)], "query_id long, text string")
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in cross_fields_topk(spark, d, q, k=10**6, tie_breaker=1.0).collect()
    }
    oracle = OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )
    exp = {did: sc for _, did, sc in oracle.score_query(text, topk=10**9)}
    assert set(got) == set(exp)
    for did in exp:
        assert np.isclose(got[did], 3.0 * exp[did], rtol=1e-9), did


# ---------------------------------------------------------------------------
# combined_fields (BM25F-style — ES multi_match type=combined_fields /
# Lucene CombinedFieldQuery): fields merged into one pseudo-field BEFORE
# saturation. Reference = direct pure-python evaluation of the documented
# formula over the same corpus.


def _bm25f_reference(corpus_pd, weights, queries, dead=()):
    import math

    from dts.score import B, K1

    toks = {
        int(r.doc_id): {f: tokenize_text(getattr(r, f)) for f in weights}
        for r in corpus_pd.itertuples()
    }
    live = {i: t for i, t in toks.items() if i not in set(dead)}
    n = len(live)
    avgdlc = sum(
        weights[f] * (sum(len(t[f]) for t in live.values()) / n)
        for f in sorted(weights)
    )
    out = {}
    for qid, text in queries:
        sc = {}
        for t in tokenize_text(text):
            dfc = min(
                n,
                sum(
                    sum(1 for d in live.values() if t in d[f])
                    for f in weights
                ),
            )
            if dfc == 0:
                continue
            idf = math.log(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
            for i, d in live.items():
                wtf = sum(
                    weights[f] * d[f].count(t) for f in sorted(weights)
                )
                if wtf <= 0:
                    continue
                dlc = sum(
                    weights[f] * len(d[f]) for f in sorted(weights)
                )
                sc[i] = sc.get(i, 0.0) + idf * (
                    wtf * (K1 + 1.0)
                    / (wtf + K1 * (1.0 - B + B * dlc / avgdlc))
                )
        out[qid] = sorted(sc.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    return out


def _cf_cases(corpus_pd):
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    return [
        (0, f"{ctoks[0]} {ctoks[1]}"),
        (1, f"{ptoks[0]}"),                       # path-heavy term
        (2, f"{ctoks[0]} {ctoks[0]}"),            # duplicate term: 2× score
        (3, "zzqqnohit"),
    ]


def test_combined_fields_vs_reference(spark, mf_index, corpus_pd):
    from dts.multifield import combined_fields_topk

    cases = _cf_cases(corpus_pd)
    q = spark.createDataFrame(cases, "query_id long, text string")
    got = combined_fields_topk(spark, mf_index, q, k=10).collect()
    ref = _bm25f_reference(corpus_pd, FIELDS, cases)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    assert 3 not in by_q  # no-hit query emits nothing
    for qid, expected in ref.items():
        rows = by_q.get(qid, [])
        assert [r["doc_id"] for r in rows] == [d for d, _ in expected[:10]]
        for r, (_, s) in zip(rows, expected):
            assert abs(r["score"] - s) < 1e-9


def test_combined_fields_duplicate_term_doubles_score(spark, mf_index, corpus_pd):
    from dts.multifield import combined_fields_topk

    t = tokenize_text(corpus_pd["content"].iloc[0])[0]
    q = spark.createDataFrame(
        [(0, t), (1, f"{t} {t}")], "query_id long, text string"
    )
    got = combined_fields_topk(spark, mf_index, q, k=5).collect()
    one = {r["doc_id"]: r["score"] for r in got if r["query_id"] == 0}
    two = {r["doc_id"]: r["score"] for r in got if r["query_id"] == 1}
    assert set(one) == set(two)
    for d in one:
        assert abs(two[d] - 2.0 * one[d]) < 1e-12


def test_combined_fields_respects_tombstones(
    spark, docs_sdf, corpus_pd, tmp_path
):
    from dts.delete import delete_docs
    from dts.multifield import combined_fields_topk

    d = str(tmp_path / "mfdel")
    build_multifield_index(
        spark, docs_sdf, d, FIELDS, bucket_size=64, block_size=16
    )
    cases = _cf_cases(corpus_pd)[:2]
    q = spark.createDataFrame(cases, "query_id long, text string")
    before = combined_fields_topk(spark, d, q, k=5).collect()
    dead = sorted({r["doc_id"] for r in before})[:2]
    for f in FIELDS:
        delete_docs(spark, f"{d}/field={f}", dead)
    after = combined_fields_topk(spark, d, q, k=5).collect()
    assert not {r["doc_id"] for r in after} & set(dead)
    # NOTE: stats (df/avgdl) intentionally keep counting tombstoned docs
    # until compaction (engine-wide contract) — so only membership is
    # asserted here, not scores.


def test_combined_fields_weight_override(spark, mf_index, corpus_pd):
    from dts.multifield import combined_fields_topk

    cases = _cf_cases(corpus_pd)[:2]
    q = spark.createDataFrame(cases, "query_id long, text string")
    w = {"content": 3.0, "path": 0.5}
    got = combined_fields_topk(spark, mf_index, q, k=10, weights=w).collect()
    ref = _bm25f_reference(corpus_pd, w, cases)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, expected in ref.items():
        rows = by_q.get(qid, [])
        assert [r["doc_id"] for r in rows] == [d for d, _ in expected[:10]]
        for r, (_, s) in zip(rows, expected):
            assert abs(r["score"] - s) < 1e-9
