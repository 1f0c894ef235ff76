"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — unit + small-e2e tests with numpy/python oracles."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from dts.dedup import (
    embedding_dup_pairs,
    exact_canonical,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_fingerprints,
)
from dts.multimodal import (
    attach_payload,
    byte_stats,
    decode_and_resize,
    decode_image,
    frame_sample,
)
from dts.similarity import cosine_topk_bruteforce, lsh_topk
from dts.textstats import language_id, quality_scores, token_counts


@pytest.fixture(scope="module")
def text_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog today"),  # near dup
        (3, "el gato es negro y la casa es grande de que"),
        (4, "der hund ist nicht mit der katze und das haus"),
        (5, "completely different words about spark query engines"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_canonical(spark, text_docs):
    got = {r.doc_id: r.canonical_id for r in exact_canonical(text_docs).collect()}
    assert got[0] == 0 and got[1] == 0  # identical texts share canonical
    assert got[2] == 2 and got[5] == 5 and got[6] == 6


def test_jaccard_pairs(spark, text_docs):
    pairs = {(r.a, r.b): r.jac6 for r in jaccard_pairs(text_docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0  # identical docs
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0  # near dup
    assert (0, 5) not in pairs


def test_minhash_lsh(spark, text_docs):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(text_docs).collect()}
    assert sigs[0] == sigs[1]  # identical docs → identical signatures
    assert len(sigs[0]) == 16
    # python oracle for one doc's first minhash
    toks = re.findall(r"[a-z0-9]+", "the quick brown fox jumps over the lazy dog")
    sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    want = min(hashlib.md5(f"0:{s}".encode()).hexdigest() for s in sh)
    assert sigs[0][0] == want
    cands = {(r.a, r.b) for r in lsh_candidate_pairs(text_docs).collect()}
    assert (0, 1) in cands  # exact dups always collide on every band
    assert (0, 5) not in cands


def test_simhash(spark, text_docs):
    got = {r.doc_id: r.simhash for r in simhash_fingerprints(text_docs).collect()}
    assert got[0] == got[1]
    ham_near = bin((got[0] ^ got[2]) & (2**64 - 1)).count("1")
    ham_far = bin((got[0] ^ got[5]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far
    assert got[6] == 0


def test_token_counts(spark, text_docs):
    got = {r.doc_id: r for r in token_counts(text_docs).collect()}
    assert got[0].n_tokens == 9
    assert got[0].n_distinct == 8  # 'the' twice
    # BPE-ish: sum ceil(len/4)
    toks = re.findall(r"[a-z0-9]+", "the quick brown fox jumps over the lazy dog")
    assert got[0].n_subword == sum(-(-len(t) // 4) for t in toks)
    assert got[6].n_tokens == 0


def test_quality_scores(spark, text_docs):
    got = {r.doc_id: r for r in quality_scores(text_docs).collect()}
    assert 0.0 <= got[0].quality6 <= 1.0
    assert got[0].stop_ratio6 > got[3].stop_ratio6  # english stopwords
    assert got[6].quality6 == 0.0


def test_language_id(spark, text_docs):
    got = {r.doc_id: r.pred_lang for r in language_id(text_docs).collect()}
    assert got[0] == "en" and got[3] == "es" and got[4] == "de"


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.RandomState(9)
    vecs = rng.standard_normal((50, 16)).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    qv = vecs[:3]
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qv[i]]) for i in range(3)],
        "q_id long, qvec array<double>",
    )
    got = cosine_topk_bruteforce(emb, queries, k=5).collect()
    # numpy oracle (on float32-roundtripped corpus vectors, as stored)
    v32 = vecs.astype(np.float32).astype(np.float64)
    for qi in range(3):
        cos = (v32 @ qv[qi]) / (np.linalg.norm(v32, axis=1) * np.linalg.norm(qv[qi]))
        cos6 = np.round(cos, 6)
        order = np.lexsort((np.arange(50), -cos6))[:5]
        want = [(int(o), cos6[o]) for o in order]
        rows = sorted(
            [r for r in got if r.q_id == qi], key=lambda r: r.rank
        )
        assert [(r.vec_id) for r in rows] == [w[0] for w in want]
        for r, w in zip(rows, want):
            assert math.isclose(r.cos6, w[1], abs_tol=2e-6), (r, w)


def test_ivf_topk_exact_when_probing_all_cells(spark):
    """Round-4 IVF: with nprobe == n_centroids every cell is probed, so
    the result must EQUAL brute force (the cell plumbing loses nothing);
    with few probes on clustered data, recall stays high."""
    from dts.similarity import ivf_topk

    rng = np.random.RandomState(21)
    centers = rng.standard_normal((20, 16))
    vecs = np.repeat(centers, 10, axis=0) + 0.15 * rng.standard_normal((200, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(4)],
        "q_id long, qvec array<double>",
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).collect()
    full = ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=8).collect()
    key = lambda rows: sorted((r.q_id, r.rank, r.vec_id, r.cos6) for r in rows)  # noqa: E731
    assert key(full) == key(exact)

    approx = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.6, recalls
    for q in range(4):
        assert q in approx_sets[q]  # the query's own vector is in its cell


def test_ivf_assignment_matches_window_spec_and_plan(spark):
    """Round-5 verdict #1: assignment is a map-side pandas-UDF matmul
    argmax — it must (a) equal the SQL-window spec the probe oracle pins
    (round-6 cosine desc, c_id asc tie-break) bit-for-bit on seeded data,
    and (b) produce a plan with NO Window / row_number over the
    n_vectors × n_centroids expansion."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dts.similarity import _ivf_centroids, ivf_assign_udf

    rng = np.random.RandomState(33)
    vecs = rng.standard_normal((150, 16)).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    cents = _ivf_centroids(e, 12, "ivf")
    rows = cents.collect()
    cent_ids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cent_mat = np.array([r["c"] for r in rows], dtype=np.float64)

    assigned = e.withColumn("c_id", ivf_assign_udf(cent_ids, cent_mat)(F.col("v")))
    plan = assigned._sc._jvm.PythonSQLUtils.explainString(
        assigned._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan and "Exchange" not in plan, plan

    # The old (round-4) window spec, inline — the semantics the oracle pins.
    dot_vc = F.expr("aggregate(zip_with(v, c, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nc = F.expr("sqrt(aggregate(transform(c, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("c_id").asc())
    old = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "c_id", F.round(dot_vc / (nv * nc), 6).alias("ccos"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "c_id")
    )
    got = {r["vec_id"]: r["c_id"] for r in assigned.select("vec_id", "c_id").collect()}
    want = {r["vec_id"]: r["c_id"] for r in old.collect()}
    assert got == want


def test_ivf_lloyd_refinement_recall(spark):
    """Round-5 verdict #7: 2 Lloyd sweeps from the md5-sampled init must
    beat (or match) the raw init's recall at equal nprobe on clustered
    data, and remain exact when probing all cells."""
    from dts.similarity import ivf_topk

    rng = np.random.RandomState(77)
    centers = rng.standard_normal((24, 16))
    vecs = np.repeat(centers, 12, axis=0) + 0.1 * rng.standard_normal((288, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(288)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i * 7]]) for i in range(6)],
        "q_id long, qvec array<double>",
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.vec_id)

    def recall(rows):
        sets = {}
        for r in rows:
            sets.setdefault(r.q_id, set()).add(r.vec_id)
        return np.mean([
            len(exact_sets[q] & sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ])

    r_init = recall(ivf_topk(emb, queries, k=10, n_centroids=24, nprobe=3).collect())
    r_lloyd = recall(
        ivf_topk(emb, queries, k=10, n_centroids=24, nprobe=3, lloyd_iters=2).collect()
    )
    assert r_lloyd >= r_init, (r_lloyd, r_init)
    assert r_lloyd >= 0.8, r_lloyd

    # probing every cell stays exact regardless of refinement
    full = ivf_topk(
        emb, queries, k=10, n_centroids=8, nprobe=8, lloyd_iters=2
    ).collect()
    key = lambda rows: sorted((r.q_id, r.rank, r.vec_id, r.cos6) for r in rows)  # noqa: E731
    assert key(full) == key(exact)


def test_lsh_topk_recall(spark):
    # Clustered embeddings (30 centers × 10 members) — the workload LSH
    # exists for; pure-random gaussians have no neighbor structure and any
    # sublinear method degrades there.
    rng = np.random.RandomState(17)
    centers = rng.standard_normal((30, 16))
    vecs = np.repeat(centers, 10, axis=0) + 0.15 * rng.standard_normal((300, 16))
    vecs = vecs.astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(5)],
        "q_id long, qvec array<double>",
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).collect()
    approx = lsh_topk(emb, queries, k=10, n_bits=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.7, recalls  # multiprobe H1, 8 bits, clustered
    # the query vector itself is always found (same bucket, cos=1)
    for q in range(5):
        assert q in approx_sets[q]


def test_embedding_dup_pairs(spark):
    base = np.ones(8)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 2.0]),  # same direction → cos 1
        (2, [float(x) for x in base + np.array([0.1] * 4 + [-0.1] * 4)]),
        (3, [float(x) for x in np.array([1.0, -1, 1, -1, 1, -1, 1, -1])]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.a, r.b): r.cos6 for r in embedding_dup_pairs(emb, tau=0.95).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert (0, 3) not in pairs


def test_multimodal_plumbing(spark, text_docs):
    media = attach_payload(text_docs)
    stats = {r.doc_id: r for r in byte_stats(media).collect()}
    raw = "the quick brown fox jumps over the lazy dog".encode()
    b = np.frombuffer(raw, dtype=np.uint8)
    counts = np.bincount(b, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(b)
    assert stats[0].n_bytes == len(raw)
    assert math.isclose(stats[0].mean_byte, float(b.mean()), rel_tol=1e-12)
    assert math.isclose(stats[0].entropy6, round(float(-(p * np.log2(p)).sum()), 6))
    assert stats[6].n_bytes == 0

    dec = {r.doc_id: r for r in decode_and_resize(media, (4, 4), fake=True).collect()}
    assert dec[0].height == 4 and dec[0].width == 4
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)

    frames = frame_sample(media, frame_bytes=8, every=2).collect()
    n0 = len([r for r in frames if r.doc_id == 0])
    total_frames = -(-len(raw) // 8)
    assert n0 == -(-total_frames // 2)


def test_simhash_jvm_matches_udf_reference(spark):
    """The production (pure-JVM) SimHash equals the per-row numpy reference
    bit-for-bit, and its physical plan contains no Python eval (round-2:
    the 100-TB scan must stay whole-stage-codegen)."""
    from pyspark.sql import functions as F

    from dts.dedup import simhash64_udf, simhash_fingerprints

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "the quick brown fox"),
            (2, "pack my box with five dozen jugs"),
            (3, ""),
            (4, None),
            (5, "aaa bbb aaa bbb ccc"),
        ],
        "doc_id long, text string",
    )
    jvm = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs).collect()
    }
    ref = {
        r["doc_id"]: r["simhash"]
        for r in docs.select(
            "doc_id", simhash64_udf(F.col("text")).alias("simhash")
        ).collect()
    }
    assert jvm == ref
    assert jvm[0] == jvm[1] != 0
    plan = (
        simhash_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_jaccard_pairs_shingle_df_cap(spark):
    """max_shingle_df drops boilerplate shingles before the self-join:
    the hot-shingle pair explosion disappears while pairs sharing rare
    shingles survive with Jaccard over the informative universe."""
    from dts.dedup import jaccard_pairs

    boiler = "copyright acme corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler} alpha beta gamma delta"),
            (1, f"{boiler} alpha beta gamma delta"),
            (2, f"{boiler} epsilon zeta eta theta"),
            (3, f"{boiler} iota kappa lambda mu"),
            (4, f"{boiler} nu xi omicron pi"),
        ],
        "doc_id long, text string",
    )
    exact = jaccard_pairs(docs, n=1, threshold=0.01)
    capped = jaccard_pairs(docs, n=1, threshold=0.01, max_shingle_df=2)
    # boilerplate unigrams appear in 5 docs -> all 10 pairs match without
    # the cap; with df<=2 only the true near-dup pair (0,1) remains, at
    # jaccard 1.0 over its informative shingles.
    assert exact.count() == 10
    rows = capped.collect()
    assert {(r["a"], r["b"]) for r in rows} == {(0, 1)}
    assert rows[0]["jac6"] == 1.0


def test_fingerprints_vs_hand_computed(spark):
    """Bottom-k md5 shingle fingerprint against a pure-Python fixture —
    direct unit coverage so the fingerprint probe can't be orphaned by a
    probe-harness change."""
    import hashlib
    import re

    from dts.textstats import fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",           # fewer than n tokens → single whole-text shingle
        "",                  # empty → one empty-string shingle
        "a a a a",           # repeated shingles deduplicate
    ]
    k, n = 3, 2

    def fp_py(text):
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        if len(toks) < n:
            sh = [" ".join(toks)]
        else:
            sh = sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
        hashes = sorted(hashlib.md5(s.encode()).hexdigest() for s in sh)
        return "|".join(hashes[:k])

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.fp for r in fingerprints(docs, k=k, n=n).collect()}
    assert got == {i: fp_py(t) for i, t in enumerate(texts)}


def _write_tiny_tpch(spark, d):
    """Hand-written 3-nation, 4-order, 6-item fixture with exact decimals."""
    spark.createDataFrame(
        [(0, "ALPHA"), (1, "BRAVO"), (2, "CHARLIE")],
        "n_nationkey long, n_name string",
    ).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2)], "c_custkey long, c_nationkey long"
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(100, 10), (101, 10), (102, 11), (103, 12)],
        "o_orderkey long, o_custkey long",
    ).write.parquet(f"{d}/orders.parquet")
    li = [
        (100, 10.00, 0.10),  # ALPHA: 10*0.9 = 9.00
        (100, 20.00, 0.00),  # ALPHA: 20.00
        (101, 5.50, 0.50),   # ALPHA: 2.75
        (102, 100.00, 0.25), # BRAVO: 75.00
        (102, 1.00, 0.00),   # BRAVO: 1.00
        (103, 7.00, 0.01),   # CHARLIE: 6.93
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_extendedprice double, l_discount double"
    ).write.parquet(f"{d}/lineitem.parquet")


def test_revenue_probes_vs_hand_computed(spark, tmp_path):
    """The relational probes (join/agg + ROLLUP) against hand-computed
    revenue on a tiny fixture written in the driver's table layout."""
    from __spark_entry__ import _q_revenue_by_nation, _q_revenue_rollup

    d = str(tmp_path)
    _write_tiny_tpch(spark, d)
    got = {
        r.n_name: (r.revenue2, r.n_items)
        for r in _q_revenue_by_nation(spark, d).collect()
    }
    assert got == {
        "ALPHA": (31.75, 3),
        "BRAVO": (76.00, 2),
        "CHARLIE": (6.93, 1),
    }
    roll = {r.n_name: r.revenue2 for r in _q_revenue_rollup(spark, d).collect()}
    assert roll == {
        "ALPHA": 31.75,
        "BRAVO": 76.00,
        "CHARLIE": 6.93,
        "ALL": 114.68,
    }


def test_ivf_split_hot_cells_bounds_and_exactness(spark):
    """Round-5 late: max_cell_size splits hot cells — on skewed data
    (one dense cluster holding most vectors) every post-split cell must
    respect the cap, the procedure is deterministic, and probing all
    cells remains exact."""
    from dts.similarity import (
        _as_double,
        _ivf_centroids,
        ivf_assign_udf,
        ivf_topk,
        split_hot_cells,
    )

    rng = np.random.RandomState(5)
    # 160 of 200 vectors in ONE tight cluster, the rest spread out.
    dense = rng.standard_normal(16)
    vecs = np.vstack(
        [
            dense + 0.02 * rng.standard_normal((160, 16)),
            rng.standard_normal((40, 16)),
        ]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    rows = _ivf_centroids(e, 8, "ivf").collect()
    ids0 = np.array([r["c_id"] for r in rows], dtype=np.int64)
    mat0 = np.array([r["c"] for r in rows], dtype=np.float64)
    cap = 60
    ids1, mat1 = split_hot_cells(e, ids0, mat0, cap, "ivf", max_rounds=6)
    assert len(ids1) > len(ids0)  # something actually split
    counts = (
        e.withColumn("c_id", ivf_assign_udf(ids1, mat1)(F.col("v")))
        .groupBy("c_id")
        .count()
        .collect()
    )
    assert max(int(r["count"]) for r in counts) <= cap
    # deterministic
    ids2, mat2 = split_hot_cells(e, ids0, mat0, cap, "ivf", max_rounds=6)
    assert np.array_equal(ids1, ids2) and np.array_equal(mat1, mat2)

    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i * 3]]) for i in range(4)],
        "q_id long, qvec array<double>",
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).collect()
    full = ivf_topk(
        emb, queries, k=10, n_centroids=8, nprobe=10**6,
        max_cell_size=cap,
    ).collect()
    key = lambda rows: sorted((r.q_id, r.rank, r.vec_id, r.cos6) for r in rows)  # noqa: E731
    assert key(full) == key(exact)


def test_embedding_dup_pairs_ivf_vs_replay(spark):
    """IVF-bucketed near-dup pairs == python replay of the assignment
    spec + within-cell exact cosine; planted duplicates are found."""
    import hashlib

    from dts.dedup import embedding_dup_pairs_ivf
    from dts.similarity import _round6_away

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    vecs[7] = vecs[3] * 1.001  # planted near-dup
    vecs[25] = vecs[20]        # planted exact dup
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    tau, ncen, seed = 0.5, 4, "ivfdup"
    got = {
        (int(r["a"]), int(r["b"])): float(r["cos6"])
        for r in embedding_dup_pairs_ivf(
            emb, tau=tau, n_centroids=ncen, seed=seed
        ).collect()
    }
    # replay: centroids = ncen smallest md5(seed||id); assignment =
    # round6-away cosine argmax with smallest-c_id tie-break
    v = vecs.astype(np.float64)
    order = sorted(
        range(40), key=lambda i: (hashlib.md5(f"{seed}{i}".encode()).hexdigest(), i)
    )
    cids = sorted(order[:ncen])
    cmat = v[cids]
    ncm = np.sqrt((cmat * cmat).sum(axis=1))
    nv = np.sqrt((v * v).sum(axis=1))
    cos = _round6_away((v @ cmat.T) / (nv[:, None] * ncm[None, :]))
    assign = np.array(cids)[cos.argmax(axis=1)]
    want = {}
    for i in range(40):
        for j in range(i + 1, 40):
            if assign[i] != assign[j]:
                continue
            c = round(float(v[i] @ v[j] / (nv[i] * nv[j])), 6)
            if c >= tau:
                want[(i, j)] = c
    assert set(got) == set(want)
    for k_ in got:
        assert abs(got[k_] - want[k_]) < 2e-6, k_
    assert (3, 7) in got and (20, 25) in got  # planted dups survive


def test_contamination_pairs_vs_replay(spark, corpus_pd):
    from dts.dedup import contamination_pairs

    def toks_of(text):
        return re.findall(r"[a-z0-9]+", (text or "").lower())

    def shingles(text, n):
        toks = toks_of(text)
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    docs = spark.createDataFrame(
        corpus_pd.head(80).rename(columns={"content": "text"})[
            ["doc_id", "text"]
        ]
    )
    # bench: two leaked corpus excerpts + one clean text (source docs
    # chosen long enough to carry >= min_shared n-grams)
    longs = [
        i for i in range(80)
        if len(toks_of(corpus_pd["content"].iloc[i])) >= 40
    ]
    i0, i1 = longs[0], longs[1]
    t0 = " ".join(toks_of(corpus_pd["content"].iloc[i0])[:20])
    t1 = " ".join(toks_of(corpus_pd["content"].iloc[i1])[10:40])
    bench_rows = [(0, t0), (1, t1), (2, "totally novel zzz words qqq")]
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    n, ms = 6, 2
    got = {
        (int(r["doc_id"]), int(r["bench_id"])): int(r["n_shared"])
        for r in contamination_pairs(
            docs, bench, n=n, min_shared=ms
        ).collect()
    }
    want = {}
    bsh = {bid: shingles(t, n) for bid, t in bench_rows}
    for _, row in corpus_pd.head(80).iterrows():
        dsh = shingles(row["content"], n)
        for bid, bs in bsh.items():
            k = len(dsh & bs)
            if k >= ms:
                want[(int(row["doc_id"]), bid)] = k
    assert got == want
    assert (int(corpus_pd["doc_id"].iloc[i0]), 0) in got
    assert (int(corpus_pd["doc_id"].iloc[i1]), 1) in got  # planted leaks flag
    assert not any(b == 2 for _, b in got)   # clean bench text stays clean
    import pytest as _pt

    with _pt.raises(ValueError, match="min_shared"):
        contamination_pairs(docs, bench, min_shared=0).collect()


def test_winnowed_span_pairs_guarantee_and_replay(spark):
    import hashlib
    import itertools

    from dts.dedup import winnowed_span_pairs

    k, w = 4, 3
    rng_words = [f"w{i:03d}" for i in range(400)]
    span = " ".join(f"leak{i}" for i in range(k + w - 1))  # 6 tokens
    rows = [
        # docs 0/1: different bodies, same planted >= k+w-1 run
        (0, " ".join(rng_words[0:40]) + " " + span + " " + " ".join(rng_words[40:60])),
        (1, " ".join(rng_words[100:130]) + " " + span),
        # doc 2: shares nothing contiguous
        (2, " ".join(rng_words[200:260])),
        # doc 3: short doc (< k tokens) falls back to whole-text gram
        (3, "tiny doc here"),
        (4, "tiny doc here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (int(r["a"]), int(r["b"])): int(r["n_shared"])
        for r in winnowed_span_pairs(docs, k=k, w=w).collect()
    }
    assert (0, 1) in got          # the guarantee: >= k+w-1 shared run
    assert (3, 4) in got          # identical short docs pair up
    assert not any(2 in p for p in got)

    # the vectorized production hash keeps the guarantee (different
    # sampled fingerprints, same span detection + determinism)
    fast1 = {
        (int(r["a"]), int(r["b"]))
        for r in winnowed_span_pairs(docs, k=k, w=w, hash="fast").collect()
    }
    fast2 = {
        (int(r["a"]), int(r["b"]))
        for r in winnowed_span_pairs(docs, k=k, w=w, hash="fast").collect()
    }
    assert (0, 1) in fast1 and (3, 4) in fast1
    assert not any(2 in p for p in fast1)
    assert fast1 == fast2  # run-to-run deterministic (no process salt)
    with pytest.raises(ValueError, match="unknown hash"):
        winnowed_span_pairs(docs, hash="sha1")

    # full replay
    def fps(text):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) < k:
            return {hashlib.md5(" ".join(toks).encode()).hexdigest()}
        grams = [
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            for i in range(len(toks) - k + 1)
        ]
        nw = max(len(grams) - w + 1, 1)
        return {min(grams[j : j + w]) for j in range(nw)}
    want = {}
    sets = {i: fps(t) for i, t in rows}
    for a, b in itertools.combinations(sorted(sets), 2):
        n = len(sets[a] & sets[b])
        if n >= 1:
            want[(a, b)] = n
    assert got == want


def test_pii_scrub_replay(spark):
    from dts.textstats import pii_scrub

    rows = [
        (0, "mail a.b+c@ex-ample.org or root@sub.domain.io now"),
        (1, "server 192.168.0.1 and 10.0.0.255."),
        (2, "call +1 555-123-4567 or 0800 11 22 33 ok"),
        (3, "no pii here at all"),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {int(r["doc_id"]): r for r in pii_scrub(docs).collect()}
    assert got[0]["n_email"] == 2 and "<EMAIL>" in got[0]["text_clean"]
    assert "@" not in got[0]["text_clean"]
    assert got[1]["n_ipv4"] == 2
    assert got[1]["text_clean"] == "server <IP> and <IP>."
    assert got[2]["n_phone"] == 2
    assert got[2]["text_clean"] == "call <PHONE> or <PHONE> ok"
    assert got[3]["text_clean"] == "no pii here at all"
    assert all(got[3][c] == 0 for c in ("n_email", "n_ipv4", "n_phone"))
    assert got[4]["text_clean"] == "" and got[5]["text_clean"] == ""


def test_filtered_knn_prefilter_semantics(spark):
    from dts.similarity import cosine_topk_bruteforce, ivf_topk

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((60, 8)).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])], "q_id long, qvec array<double>"
    )
    allow = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id")
    got = cosine_topk_bruteforce(emb, q, k=10, allow=allow).collect()
    assert len(got) == 10                     # full page from allowed set
    assert all(int(r["vec_id"]) % 2 == 1 for r in got)  # pre-filter
    assert all(int(r["vec_id"]) != 0 for r in got)      # self is even

    # equals brute force computed over the allowed subset only
    sub = cosine_topk_bruteforce(
        emb.filter(F.col("vec_id") % 2 == 1), q, k=10
    ).collect()
    key = lambda rows: [(r["rank"], r["vec_id"], r["cos6"]) for r in  # noqa: E731
                        sorted(rows, key=lambda x: x["rank"])]
    assert key(got) == key(sub)

    # IVF with nprobe == n_cells is exact under any filter
    ivf = ivf_topk(
        emb, q, k=10, n_centroids=6, nprobe=6, allow=allow
    ).collect()
    assert key(ivf) == key(sub)


def test_sq_topk_quantization_and_rescore(spark):
    from dts.similarity import cosine_topk_bruteforce, sq_encode, sq_topk

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((70, 10))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(70)],
        "vec_id long, embedding array<float>",
    )
    enc = {int(r["vec_id"]): list(r["qv"]) for r in sq_encode(emb).collect()}
    for i, qv in enc.items():
        assert max(abs(x) for x in qv) == 127  # scale hits full range
        assert all(-127 <= x <= 127 for x in qv)
        # quantization error bounded by half a step
        v32 = vecs[i].astype(np.float32).astype(np.float64)
        scale = max(np.abs(v32).max() / 127.0, 1e-30)
        assert np.allclose(
            np.array(qv), np.floor(v32 / scale + 0.5), atol=0
        )

    q = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(3)],
        "q_id long, qvec array<double>",
    )
    key = lambda rows: sorted(  # noqa: E731
        (r.q_id, r.rank, r.vec_id, r.cos6) for r in rows
    )
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    # degenerate rerank = corpus size -> identical to brute force
    assert key(sq_topk(emb, q, k=5, rerank=70).collect()) == key(exact)
    # practical rerank: high recall, self always top
    got = sq_topk(emb, q, k=5, rerank=15).collect()
    gs, es = {}, {}
    for r in got:
        gs.setdefault(r.q_id, set()).add(r.vec_id)
    for r in exact:
        es.setdefault(r.q_id, set()).add(r.vec_id)
    assert np.mean([len(gs[i] & es[i]) / 5 for i in es]) >= 0.8
    assert all(int(r["vec_id"]) == int(r["q_id"]) for r in got if r["rank"] == 1)
    with pytest.raises(ValueError, match="rerank"):
        sq_topk(emb, q, k=5, rerank=3)


def test_gopher_repetition_vs_replay(spark):
    """Full Python replay of every gopher_repetition column on docs with
    duplicate lines/paragraphs and overlapping repeated n-grams."""
    from collections import Counter

    from dts.textstats import gopher_repetition

    rows = [
        (0, "aa bb\naa bb\ncc dd\n\npara one\n\npara one"),
        (1, "x y x y x y x y"),          # overlapping grams, frac > 1
        (2, None),
        (3, ""),
        (4, "unique words only here now"),
        (5, "one\ntwo\nthree\n\n\none\n"),  # empty segments dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_repetition(docs).collect()}

    def frac(num, den):
        return round(num / max(den, 1), 6)

    for doc_id, text in rows:
        t = text or ""
        toks = re.findall(r"[a-z0-9]+", t.lower())
        tokchars = sum(len(x) for x in toks)
        r = got[doc_id]
        for unit, sep in (("line", "\n"), ("para", "\n\n")):
            segs = [s for s in t.split(sep) if s]
            dst = set(segs)
            assert r[f"n_{unit}s"] == len(segs)
            assert r[f"dup_{unit}_frac6"] == frac(len(segs) - len(dst), len(segs))
            c_all = sum(len(s) for s in segs)
            c_dst = sum(len(s) for s in dst)
            assert r[f"dup_{unit}_char_frac6"] == frac(c_all - c_dst, c_all)
        for n in (2, 3, 4):
            cnt = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            best = max(
                (c * (len(g) - (n - 1)) for g, c in cnt.items()), default=0
            )
            assert r[f"top_{n}gram_char_frac6"] == frac(best, tokchars), (doc_id, n)
        for n in (5, 10):
            cnt = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            dup = sum(
                (c - 1) * (len(g) - (n - 1)) for g, c in cnt.items() if c > 1
            )
            assert r[f"dup_{n}gram_char_frac6"] == frac(dup, tokchars), (doc_id, n)
    # the documented thresholds from the paper are on fractions in [0, 1+):
    # overlap-counted top-gram fractions may exceed 1 (doc 1)
    assert got[1]["top_4gram_char_frac6"] > 1.0
    # the numpy fast path produces bit-identical rows (same integers in,
    # same half-away rounding out)
    fast = {
        r.doc_id: r.asDict()
        for r in gopher_repetition(docs, impl="fast").collect()
    }
    assert fast == {d: got[d].asDict() for d in fast}
    with pytest.raises(ValueError, match="impl"):
        gopher_repetition(docs, impl="numpy")


def _planted_embeddings(spark, n_clusters=8, per=12, dim=32, noise=0.05):
    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim)
    rows, vid = [], 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + noise * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_topk_degenerate_recall_and_lloyd(spark):
    """PQ ANN: degenerate rerank == brute force bit-for-bit; high recall
    on planted clusters at modest rerank; Lloyd iterations reduce the
    quantization error; invalid configs rejected."""
    from dts.similarity import (
        _normalize_rows, _pq_assign, cosine_topk_bruteforce, pq_encode,
        pq_topk, pq_train,
    )

    emb = _planted_embeddings(spark)
    n = emb.count()
    q = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    cb = pq_train(emb, m=8, ksub=16, seed="t")
    enc = pq_encode(emb, cb)
    key = lambda rows: sorted(  # noqa: E731
        (r.q_id, r.rank, r.vec_id, r.cos6) for r in rows
    )
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    assert key(pq_topk(enc, q, cb, k=5, rerank=n).collect()) == key(exact)

    got = pq_topk(enc, q, cb, k=5, rerank=15).collect()
    gs, es = {}, {}
    for r in got:
        gs.setdefault(r.q_id, set()).add(r.vec_id)
    for r in exact:
        es.setdefault(r.q_id, set()).add(r.vec_id)
    assert np.mean([len(gs[i] & es[i]) / 5 for i in es]) >= 0.8
    assert all(int(r["vec_id"]) == int(r["q_id"]) for r in got if r["rank"] == 1)

    # Lloyd refinement: quantization MSE (‖x̂ − decode(code)‖²) decreases
    mat = _normalize_rows(
        np.asarray(
            [r["embedding"] for r in emb.orderBy("vec_id").collect()],
            dtype=np.float64,
        )
    )

    def mse(codebooks):
        codes = _pq_assign(mat, codebooks)
        m, ksub, dsub = codebooks.shape
        rec = np.concatenate(
            [codebooks[j][codes[:, j]] for j in range(m)], axis=1
        )
        return float(((mat - rec) ** 2).sum(axis=1).mean())

    cb2 = pq_train(emb, m=8, ksub=16, iters=3, seed="t")
    assert mse(cb2) < mse(cb)
    # refined codebooks still search fine (degenerate == brute force)
    assert key(pq_topk(emb, q, cb2, k=5, rerank=n).collect()) == key(exact)

    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=5, ksub=8)
    with pytest.raises(ValueError, match="rerank"):
        pq_topk(enc, q, cb, k=10, rerank=5)
    with pytest.raises(ValueError, match="ksub"):
        pq_train(emb, m=8, ksub=10**6)


def test_pq_assign_matches_python_replay(spark):
    """The numpy assignment (_pq_assign) equals a scalar Python replay of
    the spec — per subspace, argmin over round6(‖x_j‖²−2x_j·c+‖c‖²) with
    ties to the smallest code — on deterministic data."""
    from dts.similarity import _normalize_rows, _pq_assign, pq_train

    emb = _planted_embeddings(spark, n_clusters=4, per=6, dim=16)
    cb = pq_train(emb, m=4, ksub=8, seed="s")
    mat = _normalize_rows(
        np.asarray(
            [r["embedding"] for r in emb.orderBy("vec_id").collect()],
            dtype=np.float64,
        )
    )
    got = _pq_assign(mat, cb)
    m, ksub, dsub = cb.shape

    def r6(x):
        import math
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    for i in range(len(mat)):
        for j in range(m):
            x = mat[i, j * dsub:(j + 1) * dsub]
            best = None
            for c in range(ksub):
                cv = cb[j, c]
                d = r6(float(x @ x) - 2.0 * float(x @ cv) + float(cv @ cv))
                if best is None or d < best[0]:
                    best = (d, c)
            assert got[i, j] == best[1], (i, j)


def test_ivfpq_topk_exactness_and_encoded_input(spark):
    """IVF-PQ composition: exact at nprobe=n_cells ∧ rerank=corpus; the
    pre-encoded (ivfpq_encode) frame is a first-class input giving
    identical results; decent recall on planted clusters at nprobe 2."""
    from dts.similarity import (
        _ivf_centroids, _as_double, cosine_topk_bruteforce, ivfpq_encode,
        ivfpq_topk, pq_train,
    )

    emb = _planted_embeddings(spark, n_clusters=6, per=10, dim=32)
    n = emb.count()
    q = emb.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    cb = pq_train(emb, m=8, ksub=16, seed="t")
    key = lambda rows: sorted(  # noqa: E731
        (r.q_id, r.rank, r.vec_id, r.cos6) for r in rows
    )
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    full = ivfpq_topk(
        emb, q, cb, n_centroids=6, nprobe=6, k=5, rerank=n, seed="c"
    ).collect()
    assert key(full) == key(exact)

    # pre-encoded index frame == on-the-fly encoding
    e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
    rows = _ivf_centroids(e0, 6, "c").collect()
    cids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cmat = np.array([r["c"] for r in rows], dtype=np.float64)
    enc = ivfpq_encode(emb, cb, cids, cmat)
    got_a = ivfpq_topk(
        enc, q, cb, nprobe=2, k=5, rerank=15, cents=(cids, cmat)
    ).collect()
    got_b = ivfpq_topk(
        emb, q, cb, n_centroids=6, nprobe=2, k=5, rerank=15, seed="c"
    ).collect()
    assert key(got_a) == key(got_b)

    gs, es = {}, {}
    for r in got_a:
        gs.setdefault(r.q_id, set()).add(r.vec_id)
    for r in exact:
        es.setdefault(r.q_id, set()).add(r.vec_id)
    assert np.mean([len(gs[i] & es[i]) / 5 for i in es]) >= 0.6
    assert all(int(r["vec_id"]) == int(r["q_id"]) for r in got_a if r["rank"] == 1)

    with pytest.raises(ValueError, match="cents"):
        ivfpq_topk(enc, q, cb, k=5, rerank=15)
    with pytest.raises(ValueError, match="rerank"):
        ivfpq_topk(emb, q, cb, k=10, rerank=5)


def test_rpq_topk_residual_exactness_and_recall(spark):
    """Residual IVF-PQ (by_residual=True): exact at nprobe=n_cells ∧
    rerank=corpus; pre-encoded rpq_encode frame == on-the-fly; the
    residual quantizer holds useful recall at tight rerank (superiority
    over non-residual is a TRAINED-codebook property, not a sampled-init
    per-instance guarantee — not asserted)."""
    from dts.similarity import (
        _as_double, _ivf_centroids, cosine_topk_bruteforce,
        pq_train_residual, rpq_encode, rpq_topk,
    )

    emb = _planted_embeddings(spark, n_clusters=6, per=10, dim=32)
    n = emb.count()
    q = emb.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
    rows = _ivf_centroids(e0, 6, "c").collect()
    cids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cmat = np.array([r["c"] for r in rows], dtype=np.float64)
    rcb = pq_train_residual(emb, cids, cmat, m=8, ksub=16, seed="t")

    key = lambda rows_: sorted(  # noqa: E731
        (r.q_id, r.rank, r.vec_id, r.cos6) for r in rows_
    )
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    full = rpq_topk(
        emb, q, rcb, nprobe=6, k=5, rerank=n, cents=(cids, cmat)
    ).collect()
    assert key(full) == key(exact)

    enc = rpq_encode(emb, rcb, cids, cmat)
    got_a = rpq_topk(
        enc, q, rcb, nprobe=2, k=5, rerank=15, cents=(cids, cmat)
    ).collect()
    got_b = rpq_topk(
        emb, q, rcb, nprobe=2, k=5, rerank=15, cents=(cids, cmat)
    ).collect()
    assert key(got_a) == key(got_b)

    def recall(topk_rows):
        gs, es = {}, {}
        for r in topk_rows:
            gs.setdefault(r.q_id, set()).add(r.vec_id)
        for r in exact:
            es.setdefault(r.q_id, set()).add(r.vec_id)
        return float(np.mean([len(gs.get(i, set()) & es[i]) / 5 for i in es]))

    # tight rerank: the ADC ordering has to carry real signal
    res = rpq_topk(
        emb, q, rcb, nprobe=6, k=5, rerank=8, cents=(cids, cmat)
    ).collect()
    assert recall(res) >= 0.6
    # at tight rerank the ADC pass may drop a query's own vector — the
    # self-hit contract is only guaranteed on the exact configuration
    hits = [int(r["vec_id"]) == int(r["q_id"]) for r in res if r["rank"] == 1]
    assert sum(hits) >= len(hits) / 2
    assert all(
        int(r["vec_id"]) == int(r["q_id"]) for r in full if r["rank"] == 1
    )


def test_opq_rotation_properties_and_recall(spark):
    """OPQ: R orthonormal + deterministic; cosine invariance through the
    rotation; on ANISOTROPIC data (variance mixed across PQ's arbitrary
    subspace splits) OPQ's ADC recall at tight rerank beats plain PQ."""
    from dts.similarity import (
        cosine_topk_bruteforce, opq_rotate, opq_train, pq_topk, pq_train,
    )

    # anisotropic deterministic corpus: low-rank structure mixed across
    # all dims by a fixed ill-conditioned matrix
    dim, n = 32, 96
    mix = np.array(
        [[((7 * i + 11 * j) % 13) - 6.0 for j in range(dim)] for i in range(5)]
    )
    rows = []
    for i in range(n):
        z = np.array([((i * (k + 3)) % 17) - 8.0 for k in range(5)])
        v = z @ mix + 0.01 * np.array(
            [((i + 31 * k) % 7) - 3.0 for k in range(dim)]
        )
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") % 19 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )

    R, ocb = opq_train(emb, m=8, ksub=16, seed="t")
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-9)
    R2, _ = opq_train(emb, m=8, ksub=16, seed="t")
    assert np.array_equal(R, R2)

    rot = opq_rotate(emb, R)
    rq = opq_rotate(
        q.withColumnRenamed("q_id", "vec_id").withColumnRenamed(
            "qvec", "embedding"
        ),
        R,
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec"))

    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    exact_rot = cosine_topk_bruteforce(rot, rq, k=5).collect()
    assert sorted((r.q_id, r.rank, r.vec_id) for r in exact) == sorted(
        (r.q_id, r.rank, r.vec_id) for r in exact_rot
    )

    def recall(topk_rows):
        gs, es = {}, {}
        for r in topk_rows:
            gs.setdefault(r.q_id, set()).add(r.vec_id)
        for r in exact:
            es.setdefault(r.q_id, set()).add(r.vec_id)
        return float(np.mean([len(gs.get(i, set()) & es[i]) / 5 for i in es]))

    pcb = pq_train(emb, m=8, ksub=16, seed="t")
    plain = pq_topk(emb, q, pcb, k=5, rerank=6).collect()
    opq = pq_topk(rot, rq, ocb, k=5, rerank=6).collect()
    assert recall(opq) >= recall(plain)
    assert recall(opq) >= 0.6


def test_dedup_paragraphs(spark):
    from dts.dedup import dedup_paragraphs

    boiler = "this is a repeated cookie banner line"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler}\nunique first body\nshort"),
            (1, f"intro text here\n{boiler}\n{boiler}"),
            (2, "totally unique document body"),
            (3, boiler),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        int(r["doc_id"]): (r["text"], int(r["n_removed"]))
        for r in dedup_paragraphs(docs, min_count=2).collect()
    }
    assert got[0] == ("unique first body\nshort", 1)  # short line kept
    assert got[1] == ("intro text here", 2)           # both copies cut
    assert got[2] == ("totally unique document body", 0)
    assert got[3] == ("", 1)                          # fully-boilerplate doc
    assert got[4] == ("", 0)

    # min_count above the corpus multiplicity: nothing removed
    none = dedup_paragraphs(docs, min_count=5).collect()
    assert all(int(r["n_removed"]) == 0 for r in none)

    import pytest as _pt

    with _pt.raises(ValueError):
        dedup_paragraphs(docs, min_count=1)


def test_gopher_quality_rules(spark):
    from dts.textstats import gopher_quality

    good = " ".join(
        ["the quick brown fox jumps over and that have with lazy dog"] * 5
    )  # 60 words, all alpha, plenty of stopwords
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "short doc"),                               # < 50 words
            (2, " ".join(["####"] * 60)),                   # symbols, no alpha
            (3, "- a\n- b\n- c\nplain"),                    # bullet lines
            (4, "ends with dots...\nand more…"),            # ellipsis lines
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {int(r["doc_id"]): r for r in gopher_quality(docs).collect()}
    assert got[0]["passes"] and got[0]["n_words"] == 60
    assert not got[1]["passes"]
    g2 = got[2]
    assert g2["alpha_frac6"] == 0.0 and g2["symbol_ratio6"] == 4.0
    assert not g2["passes"]
    assert got[3]["bullet_frac6"] == 0.75
    assert got[4]["ellipsis_frac6"] == 1.0
    assert got[5]["n_words"] == 0 and not got[5]["passes"]


def test_gopher_quality_fast_bit_identical(spark):
    """Round-6: gopher_quality(impl="fast") must produce bit-identical
    rows to the expression SPEC on adversarial edge docs — Java-\\s word
    splitting (\\xa0 is NOT whitespace), ltrim/rtrim trimming 0x20 only,
    Java default-mode '$' matching before one final line terminator,
    non-overlapping '(...|…)' counting, ASCII-exact stopword lowering."""
    from dts.textstats import gopher_quality

    edge = [
        "",
        None,
        "   ",
        "\t\t",
        "the THE The tHe the\xa0the",          # \xa0 binds words in Java \s
        "be to of and that have with the",
        "a İ Σ ΑΣ K K ſ ſ",          # unicode lowering traps
        "...",
        ".... ..... ......",
        "…… .… ..… x...",
        "- bullet\n * star\n• dot\n  - spaced\n\t- tabbed",
        "ends...\nends…\nends... \nends...\r\nends…\r",
        "x...\r\r\ny \nz… ",
        "only spaces line   \n...\n  \n",
        "\n\n\n",
        "#tag ## #.#.#",
        "word\rcarriage\rreturn",
        "multi  \t spaces\tand\ttabs",
        "……… three ellipses",
        "trailing newline ends...\n",
        "a" * 300 + " " + "the and",
    ]
    # plus a slice of the real corpus
    real = [
        r["content"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        ).select(F.col("text").alias("content")).limit(150).collect()
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(edge + real)],
        "doc_id long, text string",
    )
    want = {r["doc_id"]: r.asDict() for r in gopher_quality(docs).collect()}
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality(docs, impl="fast").collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        gopher_quality(docs, impl="numpy")
