"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k via broadcast query × corpus join;
  dot products with built-in zip_with/aggregate (JVM) — the baseline and
  the oracle-checkable probe.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets (signature
  computed in ONE vectorized pandas UDF as a numpy matmul), queries probe
  only matching buckets (multi-probe over Hamming-1 neighbors), exact
  re-rank inside buckets. At 10^12 vectors the bucket join replaces the
  full cross join; recall is tested against brute force on seeded data.
- ``pq_train`` / ``pq_encode`` / ``pq_topk`` (round 5): product
  quantization (FAISS IndexPQ + rescore) — m per-subspace codebooks
  compress each vector to m small codes (16 bytes at m=16/ksub=256 vs
  3 KB float32 at 768 dims), ADC ranking reads codes instead of floats,
  exact rescore of the top window. The memory-compression path that
  makes a 10⁹-vector index RAM-resident; complementary to SQ (4×) and
  IVF (scan pruning) — production systems compose them (IVF-PQ).
- ``ivf_topk`` (round 4): the inverted-file scale path — a coarse
  quantizer (deterministic md5-sampled centroids, the classic
  random-subset init, engine-portable so the probe has an exact SQL
  oracle) partitions vectors into cells; queries probe only the nprobe
  nearest cells and re-rank exactly inside. Complementary to LSH: cells
  are DATA-ADAPTIVE (follow the embedding distribution) where hyperplane
  buckets are oblivious. At cluster scale the centroid table broadcasts
  (n_centroids ~ √n rows), assignment is one map-side argmax per vector,
  and the probe join touches nprobe/n_centroids of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

ROUND = 6


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x as double))")


def cosine_topk_bruteforce(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    allow: DataFrame | None = None,
) -> DataFrame:
    """queries(q_id, qvec array<double>) × emb(vec_id, embedding) → exact
    top-k by cosine: (q_id, vec_id, cos6, rank). Query side broadcast.

    ``allow``: ES filtered-kNN PRE-filter semantics — a (vec_id)
    DataFrame restricting the candidate universe BEFORE ranking, so the
    top-k is the best of the eligible set (post-filtering would return
    fewer than k). The filter is a semi-join pushed ahead of the scoring
    cross: at corpus scale it prunes the scan, it never re-ranks."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    if allow is not None:
        e = e.join(allow.select("vec_id").distinct(), "vec_id", "left_semi")
    q = queries.select("q_id", F.col("qvec").alias("w"))
    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = e.crossJoin(F.broadcast(q)).select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def sq_encode(emb: DataFrame, src: str = "embedding") -> DataFrame:
    """int8 scalar quantization (Lucene's int8 HNSW / FAISS SQ8 shape):
    per-vector scale = max|x| / 127, q_i = floor(x_i/scale + 0.5) ∈
    [−127, 127] — 4× smaller than float32, which at 10⁹×768 vectors is
    the difference between 3 TB and 0.77 TB of vector data per replica.
    Emits (vec_id, qv array<int>, qn double = ‖q‖): for COSINE the
    per-vector scales cancel, so ranking needs only q and its norm.
    100% JVM expressions; the rounding mode (floor(x+0.5), half-up) is
    the engine-portable spec the oracle replicates."""
    v = _as_double(src)
    qv = F.expr(
        f"transform({_as_double_sql(src)}, x -> cast(floor(x / "
        f"(greatest(array_max(transform({_as_double_sql(src)}, y -> abs(y))) / 127.0, 1e-30))"
        f" + 0.5) as int))"
    )
    out = emb.select("vec_id", v.alias("v"), qv.alias("qv"))
    qn = F.expr(
        "sqrt(aggregate(transform(qv, a -> cast(a as double) * a), cast(0.0 as double), (acc, z) -> acc + z))"
    )
    return out.select("vec_id", "v", "qv", qn.alias("qn"))


def _as_double_sql(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def sq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 40,
) -> DataFrame:
    """Two-stage quantized search (ES int8_hnsw rescore shape): rank ALL
    vectors by int8-quantized cosine (scales cancel — integer dot over
    4×-smaller data), keep the top ``rerank`` per query, then exact
    float re-rank of only those — (q_id, vec_id, cos6, rank) with cos6
    the EXACT cosine of the survivors. rerank ≥ k bounds the quality
    trade; rerank = corpus size degenerates to brute force.

    ``emb`` may be raw (vec_id, embedding) — encoded on the fly, fine
    for tests — or an ALREADY-ENCODED frame from :func:`sq_encode`
    (columns v/qv/qn). Materialize the encoding once per corpus: it IS
    the vector index (measured at 100k×64: 6.1 s re-encoding per batch
    vs 2.8 s over a persisted encoding — wall-parity with float brute
    force at this expr-bound toy scale; the persisted int8 table's 4×
    size win is what matters when 10⁹ vectors make the scan
    memory/IO-bound)."""
    if rerank < k:
        raise ValueError("rerank must be >= k")
    e = (
        emb
        if {"v", "qv", "qn"}.issubset(set(emb.columns))
        else sq_encode(emb)
    )
    q = sq_encode(
        queries.select(F.col("q_id").alias("vec_id"), F.col("qvec").alias("embedding"))
    ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("w"),
        F.col("qv").alias("qw"), F.col("qn").alias("qwn"),
    )
    qdot = F.expr(
        "aggregate(zip_with(qv, qw, (a, b) -> cast(a as double) * b), cast(0.0 as double), (acc, z) -> acc + z)"
    )
    cand = (
        e.crossJoin(F.broadcast(q))
        .select(
            "q_id", "vec_id", "v", "w",
            F.round(qdot / (F.col("qn") * F.col("qwn")), ROUND).alias("qcos6"),
        )
    )
    w_c = Window.partitionBy("q_id").orderBy(
        F.col("qcos6").desc(), F.col("vec_id").asc()
    )
    cand = cand.withColumn("r", F.row_number().over(w_c)).filter(
        F.col("r") <= int(rerank)
    )
    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = cand.select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos6").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.sqrt((m * m).sum(axis=1))
    return m / np.maximum(n, 1e-30)[:, None]


def pq_train(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 0,
    seed: str = "pq",
    src: str = "embedding",
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011, the FAISS
    IndexPQ shape): the vector space is split into ``m`` subspaces of
    dim/m dims; each subspace gets its own ``ksub``-entry codebook, so a
    vector compresses to m small codes — at m=16, ksub=256 a 768-dim
    float32 vector becomes 16 bytes (192× smaller), the classic way a
    10⁹-vector index fits in cluster memory.

    Codebooks are trained on L2-NORMALIZED vectors (cosine search: after
    normalization, inner product == cosine and PQ's L2 cells quantize the
    sphere). Init is the engine-portable deterministic sampled subset —
    codebook entry c of subspace j is the j-th subvector of the vector
    with the (c+1)-th smallest md5(seed || vec_id) (same rule as
    :func:`_ivf_centroids`, so the probe's DuckDB oracle recomputes the
    init exactly); ``iters`` k-means refinements per subspace run
    distributed (one map-side assignment UDF + per-partition partial sums,
    client-sized combine — the :func:`lloyd_refine` shape), with the
    probe pinning the iters=0 variant.

    Returns codebooks as a float64 ndarray of shape (m, ksub, dim // m);
    codes are 0..ksub−1 in sample order."""
    rows = (
        emb.select("vec_id", _as_double(src).alias("v"))
        .withColumn(
            "_h", F.md5(F.concat(F.lit(seed), F.col("vec_id").cast("string")))
        )
        .orderBy("_h", "vec_id")
        .limit(int(ksub))
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"corpus has {len(rows)} vectors < ksub={ksub}")
    sample = _normalize_rows(np.asarray([r["v"] for r in rows], dtype=np.float64))
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    codebooks = np.ascontiguousarray(
        sample.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )
    if iters:
        codebooks = _pq_lloyd(emb, codebooks, iters, src=src)
    return codebooks


def _pq_assign(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """codes (n, m) for NORMALIZED rows ``mat``: per subspace j,
    argmin over codebook entries of round6(‖x_j‖² − 2·x_j·c + ‖c‖²),
    ties to the smallest code — the engine-portable spec (the same
    round-then-first-argmin contract as :func:`ivf_assign_udf`)."""
    n, dim = mat.shape
    m, ksub, dsub = codebooks.shape
    xs = mat.reshape(n, m, dsub)
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        cb = codebooks[j]
        d = (
            (xs[:, j] * xs[:, j]).sum(axis=1)[:, None]
            - 2.0 * (xs[:, j] @ cb.T)
            + (cb * cb).sum(axis=1)[None, :]
        )
        codes[:, j] = _round6_away(d).argmin(axis=1)
    return codes


def _pq_lloyd(
    emb: DataFrame, codebooks: np.ndarray, iters: int, src: str = "embedding"
) -> np.ndarray:
    """Per-subspace k-means refinement, distributed like
    :func:`lloyd_refine`: assignment is map-side (one mapInPandas pass
    emits per-partition partial sums keyed (j, code) — m·ksub rows per
    partition, client-sized combine); empty cells keep their entry.
    Partials are combined in sorted order so results don't depend on
    collect() ordering."""
    m, ksub, dsub = codebooks.shape
    e = emb.select(_as_double(src).alias("v"))

    for _ in range(iters):
        cb = codebooks  # bind current value for the closure

        def _partials(batches, cb=cb):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = _normalize_rows(
                    np.asarray(pdf["v"].tolist(), dtype=np.float64)
                )
                codes = _pq_assign(mat, cb)
                xs = mat.reshape(len(mat), m, dsub)
                for j in range(m):
                    for c in np.unique(codes[:, j]):
                        sel = xs[codes[:, j] == c, j]
                        yield pd.DataFrame(
                            {
                                "j": [int(j)],
                                "code": [int(c)],
                                "s": [sel.sum(axis=0).tolist()],
                                "n": [int(len(sel))],
                            }
                        )

        parts = e.mapInPandas(
            _partials, schema="j long, code long, s array<double>, n long"
        ).collect()
        parts.sort(key=lambda r: (r["j"], r["code"], r["n"], tuple(r["s"])))
        sums = np.zeros((m, ksub, dsub))
        counts = np.zeros((m, ksub), dtype=np.int64)
        for r in parts:
            sums[int(r["j"]), int(r["code"])] += np.asarray(r["s"])
            counts[int(r["j"]), int(r["code"])] += int(r["n"])
        new_cb = codebooks.copy()
        nz = counts > 0
        new_cb[nz] = sums[nz] / counts[nz][:, None]
        codebooks = new_cb
    return codebooks


def pq_encode(
    emb: DataFrame, codebooks: np.ndarray, src: str = "embedding"
) -> DataFrame:
    """(vec_id, v, codes): PQ-encode every vector — ONE vectorized pandas
    UDF holding the broadcast codebooks; per Arrow batch the assignment is
    m numpy matmul+argmins over the normalized subvectors (zero shuffle,
    zero row expansion — the :func:`ivf_assign_udf` lesson). ``codes`` is
    m small ints; persist (vec_id, codes) once and it IS the vector
    index — the float column rides along here only for the exact-rescore
    stage (at scale the rescore joins the raw table instead)."""
    m, ksub, dsub = codebooks.shape
    cb = np.ascontiguousarray(codebooks)

    @F.pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = _normalize_rows(np.asarray(vecs.tolist(), dtype=np.float64))
        codes = _pq_assign(mat, cb)
        return pd.Series([c.astype("int32").tolist() for c in codes])

    return emb.select(
        "vec_id",
        _as_double(src).alias("v"),
    ).withColumn("codes", assign(F.col("v")))


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    rerank: int = 40,
) -> DataFrame:
    """Two-stage PQ search (FAISS IndexPQ + rescore): rank ALL vectors by
    the ADC approximation — per query, a (m × ksub) lookup table of
    round6 subspace inner products is built client-side (queries are
    client-sized by this module's contract) and each vector's approximate
    cosine is the left-fold sum of m table gathers, computed in ONE
    vectorized pandas UDF over the 8-byte codes instead of the float
    vectors — then exact float re-rank of the top ``rerank`` survivors
    only. (q_id, vec_id, cos6, rank) with cos6 the EXACT cosine.

    ``emb`` may be raw (vec_id, embedding) — encoded on the fly, fine for
    tests — or an already-encoded frame from :func:`pq_encode` (columns
    v/codes): the persisted codes table is the index. At 10⁹ vectors the
    ADC pass reads m bytes/vector instead of 4·dim — the scan-volume win
    that makes memory-resident vector search possible — and the rescore
    touches only rerank·|queries| rows."""
    if rerank < k:
        raise ValueError("rerank must be >= k")
    m, ksub, dsub = codebooks.shape
    e = (
        emb
        if {"v", "codes"}.issubset(set(emb.columns))
        else pq_encode(emb, codebooks)
    )
    qrows = sorted(
        queries.select("q_id", "qvec").collect(), key=lambda r: r["q_id"]
    )
    if not qrows:
        return e.sparkSession.createDataFrame(
            [], "q_id long, vec_id long, cos6 double, rank int"
        )
    qmat = np.asarray([r["qvec"] for r in qrows], dtype=np.float64)
    qn = _normalize_rows(qmat).reshape(len(qrows), m, dsub)
    # LUT p6[q, j, c] = round6(<q̂_j, cb_jc>) — the oracle recomputes these
    lut = _round6_away(
        np.einsum("qjd,jcd->qjc", qn, codebooks)
    )

    @F.pandas_udf("array<double>")
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        cm = np.asarray(codes.tolist(), dtype=np.int64)  # (B, m)
        acc = lut[:, 0, cm[:, 0]]  # (Q, B)
        for j in range(1, m):
            acc = acc + lut[:, j, cm[:, j]]
        return pd.Series(list(_round6_away(acc.T)))

    spark = e.sparkSession
    q_df = spark.createDataFrame(
        [(i, int(r["q_id"]), [float(x) for x in r["qvec"]]) for i, r in enumerate(qrows)],
        "q_idx int, q_id long, w array<double>",
    )
    cand = (
        e.withColumn("_a", adc(F.col("codes")))
        .select("vec_id", "v", F.posexplode("_a").alias("q_idx", "adc6"))
        .join(F.broadcast(q_df), "q_idx")
    )
    w_c = Window.partitionBy("q_id").orderBy(
        F.col("adc6").desc(), F.col("vec_id").asc()
    )
    cand = cand.withColumn("r", F.row_number().over(w_c)).filter(
        F.col("r") <= int(rerank)
    )
    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = cand.select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos6").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def _round6_away(x: np.ndarray) -> np.ndarray:
    """Round half-AWAY-from-zero to 6 dp — Spark's round() (BigDecimal
    HALF_UP) and DuckDB's round() both use this mode; numpy's np.round is
    banker's rounding and would diverge on .5 boundaries."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def ivf_assign_udf(cent_ids: np.ndarray, cent_mat: np.ndarray):
    """Map-side coarse-quantizer assignment: ONE vectorized pandas UDF
    holding the centroid matrix; per Arrow batch, assignment is a numpy
    matmul + argmax — no row expansion, no shuffle, no window (round-4
    verdict #1: the crossJoin + per-vector row_number() materialized an
    n_vectors × n_centroids shuffle for what is a map-side argmax).

    Semantics are bit-matched to the SQL-window spec the probe oracle
    pins: cosine rounded half-away-from-zero to 6 dp, ties broken by
    smallest c_id (centroid columns are sorted by c_id, and argmax takes
    the first maximum)."""
    order = np.argsort(cent_ids, kind="stable")
    ids = np.ascontiguousarray(cent_ids[order])
    mat = np.ascontiguousarray(cent_mat[order])
    ncen = np.sqrt((mat * mat).sum(axis=1))

    @F.pandas_udf(LongType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        if m.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        nv = np.sqrt((m * m).sum(axis=1))
        cos6 = _round6_away((m @ mat.T) / (nv[:, None] * ncen[None, :]))
        return pd.Series(ids[cos6.argmax(axis=1)])

    return assign


def _ivf_centroids(e: DataFrame, n_centroids: int, seed: str) -> DataFrame:
    """The ``n_centroids`` vectors with the smallest md5(seed || vec_id) —
    a deterministic pseudo-random subset (the standard sampled-centroid
    init) that any engine can recompute, which is what makes the probe's
    DuckDB oracle exact."""
    return (
        e.withColumn(
            "_h", F.md5(F.concat(F.lit(seed), F.col("vec_id").cast("string")))
        )
        .orderBy("_h", "vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("c_id"), F.col("v").alias("c"))
    )


def lloyd_refine(
    e: DataFrame,
    cent_ids: np.ndarray,
    cent_mat: np.ndarray,
    iters: int,
) -> np.ndarray:
    """k-means refinement from the sampled init: each iteration assigns
    map-side (the same zero-shuffle UDF the query path uses) and computes
    per-cell means via per-partition partial sums in mapInPandas — the
    only shuffle-free aggregation shape for elementwise array means — then
    a client-sized driver combine (n_partitions × n_centroids rows).
    Empty cells keep their previous centroid. Partials are summed in a
    deterministically sorted order so the result doesn't depend on
    collect() ordering."""
    dim = cent_mat.shape[1]

    def _partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            cids = pdf["c_id"].to_numpy()
            for cid in np.unique(cids):
                sel = m[cids == cid]
                yield pd.DataFrame(
                    {
                        "c_id": [int(cid)],
                        "s": [sel.sum(axis=0).tolist()],
                        "n": [int(len(sel))],
                    }
                )

    for _ in range(iters):
        assign = ivf_assign_udf(cent_ids, cent_mat)
        a = e.select("vec_id", "v").withColumn("c_id", assign(F.col("v")))
        parts = a.select("c_id", "v").mapInPandas(
            _partials, schema="c_id long, s array<double>, n long"
        ).collect()
        parts.sort(key=lambda r: (r["c_id"], r["n"], tuple(r["s"])))
        sums = {int(c): np.zeros(dim) for c in cent_ids}
        counts = {int(c): 0 for c in cent_ids}
        for r in parts:
            sums[int(r["c_id"])] += np.asarray(r["s"])
            counts[int(r["c_id"])] += int(r["n"])
        new_mat = cent_mat.copy()
        for i, cid in enumerate(cent_ids):
            if counts[int(cid)]:
                new_mat[i] = sums[int(cid)] / counts[int(cid)]
        cent_mat = new_mat
    return cent_mat


def split_hot_cells(
    e: DataFrame,
    cent_ids: np.ndarray,
    cent_mat: np.ndarray,
    cap: int,
    seed: str,
    max_rounds: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Balanced-cell refinement: any cell holding more than ``cap``
    vectors is SPLIT — its centroid is replaced by two deterministic
    member samples (smallest md5(seed:split:vec_id) within the cell, the
    same sampled-subset rule as the global init, scoped per cell) and
    everything reassigns; repeat until no cell exceeds the cap or
    ``max_rounds``. Hot cells are the IVF failure mode on skewed
    embeddings: one dense cluster swallows a constant fraction of the
    corpus and every probe touching it degenerates toward brute force.
    Splitting bounds the probe-time cell scan; centroid ids stay
    vec_id-derived (samples exclude vectors already serving as
    centroids, so ids never collide).

    Cost per round: one map-side assignment pass + a tiny per-cell count
    agg + a window over HOT cells' members only. The centroid count
    grows by one per split — still ~√n-scale, still a broadcast."""
    for _ in range(max_rounds):
        assign = ivf_assign_udf(cent_ids, cent_mat)
        a = e.select("vec_id", "v").withColumn("c_id", assign(F.col("v")))
        counts = a.groupBy("c_id").agg(F.count("*").alias("n")).collect()
        hot = sorted(int(r["c_id"]) for r in counts if int(r["n"]) > cap)
        if not hot:
            break
        w = Window.partitionBy("c_id").orderBy("_h", "vec_id")
        taken = {int(c) for c in cent_ids}
        samples = (
            a.filter(F.col("c_id").isin(hot))
            .filter(~F.col("vec_id").isin(sorted(taken)))
            .withColumn(
                "_h",
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:split:"),
                        F.col("vec_id").cast("string"),
                    )
                ),
            )
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 2)
            .select("c_id", "vec_id", "v")
            .collect()
        )
        by_cell: dict[int, list] = {}
        for r in samples:
            by_cell.setdefault(int(r["c_id"]), []).append(
                (int(r["vec_id"]), np.asarray(r["v"], dtype=np.float64))
            )
        split = {c for c, s in by_cell.items() if len(s) >= 2}
        if not split:
            break  # hot cells too degenerate to split (duplicate vectors)
        keep = [i for i, c in enumerate(cent_ids) if int(c) not in split]
        new_ids = [int(c) for c in cent_ids[keep]]
        new_vecs = [cent_mat[i] for i in keep]
        for c in sorted(split):
            for vid, vec in by_cell[c][:2]:
                new_ids.append(vid)
                new_vecs.append(vec)
        order = np.argsort(np.asarray(new_ids, dtype=np.int64), kind="stable")
        cent_ids = np.asarray(new_ids, dtype=np.int64)[order]
        cent_mat = np.asarray(new_vecs, dtype=np.float64)[order]
    return cent_ids, cent_mat


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: str = "ivf",
    lloyd_iters: int = 0,
    max_cell_size: int | None = None,
    allow: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest centroid
    (cosine, round-6 tie-broken by centroid id), probe each query's
    ``nprobe`` nearest cells, exact re-rank inside. Same output schema as
    brute force: (q_id, vec_id, cos6, rank).

    Centroids start from the deterministic md5-sampled subset (see
    _ivf_centroids — engine-portable, so the lloyd_iters=0 default has an
    exact SQL oracle); ``lloyd_iters`` > 0 runs that many k-means
    refinement sweeps (lloyd_refine) for balanced cells / higher recall
    on clustered data, at one extra assignment pass per sweep.
    ``max_cell_size`` then SPLITS any cell still above the cap
    (split_hot_cells — skew insurance: bounds the probe-time scan of a
    query that lands in a dense cluster). Exactness at
    nprobe ≥ n_cells is preserved under any centroid set.

    Scale: the centroid table is the coarse quantizer — ~√n rows, held
    as a numpy matrix inside the assignment UDF on every executor (the
    standard IVF contract, cf. FAISS); assignment is one map-side matmul
    argmax per Arrow batch with NO shuffle and NO row expansion. Only
    the probed-cells join shuffles, touching ~nprobe/n_centroids of the
    corpus."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    # Client-sized collect by design: the coarse quantizer (~√n rows) is
    # the one structure IVF replicates everywhere.
    rows = _ivf_centroids(e, n_centroids, seed).collect()
    cent_ids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cent_mat = np.array([r["c"] for r in rows], dtype=np.float64)
    if lloyd_iters:
        cent_mat = lloyd_refine(e, cent_ids, cent_mat, lloyd_iters)
    if max_cell_size is not None:
        cent_ids, cent_mat = split_hot_cells(
            e, cent_ids, cent_mat, max_cell_size, seed
        )
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [
            (int(c), [float(x) for x in cent_mat[i]])
            for i, c in enumerate(cent_ids)
        ],
        "c_id long, c array<double>",
    )
    assigned = e.withColumn(
        "c_id", ivf_assign_udf(cent_ids, cent_mat)(F.col("v"))
    )
    if allow is not None:
        # Filtered kNN (ES pre-filter semantics): restrict CANDIDATES,
        # keep the quantizer trained on the full corpus — the filter
        # applies after cell assignment, before re-rank. Recall caveat
        # (as in ES/FAISS): a highly selective filter concentrated
        # outside the probed cells needs a larger nprobe.
        assigned = assigned.join(
            allow.select("vec_id").distinct(), "vec_id", "left_semi"
        )
    dot_vc = F.expr("aggregate(zip_with(v, c, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nc = F.expr("sqrt(aggregate(transform(c, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    q = queries.select("q_id", F.col("qvec").alias("v"))
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("ccos").desc(), F.col("c_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "q_id", F.col("v").alias("w"), "c_id",
            F.round(dot_vc / (nv * nc), ROUND).alias("ccos"),
        )
        .withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("q_id", "w", "c_id")
    )
    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = assigned.join(F.broadcast(probes), "c_id").select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos6").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def ivfpq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    cent_ids: np.ndarray,
    cent_mat: np.ndarray,
    src: str = "embedding",
) -> DataFrame:
    """(vec_id, v, c_id, codes): the full IVF-PQ index row — coarse cell
    (map-side argmax UDF) + PQ codes (map-side argmin UDF) in one pass,
    zero shuffle. Persist (vec_id, c_id, codes) partitioned by c_id and
    it IS the FAISS-style IVFPQ index: cell-pruned scans over m-byte
    codes."""
    m, ksub, dsub = codebooks.shape
    cb = np.ascontiguousarray(codebooks)

    @F.pandas_udf("array<int>")
    def assign_codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = _normalize_rows(np.asarray(vecs.tolist(), dtype=np.float64))
        codes = _pq_assign(mat, cb)
        return pd.Series([c.astype("int32").tolist() for c in codes])

    return (
        emb.select("vec_id", _as_double(src).alias("v"))
        .withColumn("c_id", ivf_assign_udf(cent_ids, cent_mat)(F.col("v")))
        .withColumn("codes", assign_codes(F.col("v")))
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    rerank: int = 40,
    seed: str = "ivf",
    lloyd_iters: int = 0,
    cents: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """IVF-PQ search (the FAISS IndexIVFPQ composition — the production
    shape for 10⁹+ vectors): the coarse quantizer prunes the SCAN to
    nprobe/n_centroids of the corpus (IVF) and the scan itself reads
    m-byte PQ codes instead of float vectors (ADC), then the top
    ``rerank`` survivors per query get an exact float re-rank. Both
    compressions compose multiplicatively: at n_centroids=√n, nprobe=8,
    m=16 a query touches ~8/√n of the corpus at 16 bytes/vector.

    PQ here is NON-residual (codes quantize the normalized vector, not
    x − centroid — FAISS's by_residual=False variant): one shared
    codebook set serves every cell, which keeps the ADC lookup table
    per-query instead of per-(query, cell). Documented delta vs the
    residual default; the exact-rescore window absorbs most of the
    accuracy gap at these code sizes.

    ``emb`` may be raw (vec_id, embedding) or a pre-encoded frame from
    :func:`ivfpq_encode` (columns v/c_id/codes) — the persisted encoding
    is the index; pass the SAME ``cents`` it was encoded with.
    Exact at nprobe ≥ n_centroids ∧ rerank ≥ corpus (tested)."""
    if rerank < k:
        raise ValueError("rerank must be >= k")
    m, ksub, dsub = codebooks.shape
    spark = emb.sparkSession
    pre_encoded = {"v", "c_id", "codes"}.issubset(set(emb.columns))
    if cents is None:
        if pre_encoded:
            raise ValueError(
                "pre-encoded input requires the cents=(ids, mat) it was "
                "encoded with"
            )
        e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
        rows = _ivf_centroids(e0, n_centroids, seed).collect()
        cent_ids = np.array([r["c_id"] for r in rows], dtype=np.int64)
        cent_mat = np.array([r["c"] for r in rows], dtype=np.float64)
        if lloyd_iters:
            cent_mat = lloyd_refine(e0, cent_ids, cent_mat, lloyd_iters)
    else:
        cent_ids, cent_mat = cents
    e = emb if pre_encoded else ivfpq_encode(emb, codebooks, cent_ids, cent_mat)

    qrows = sorted(
        queries.select("q_id", "qvec").collect(), key=lambda r: r["q_id"]
    )
    if not qrows:
        return spark.createDataFrame(
            [], "q_id long, vec_id long, cos6 double, rank int"
        )
    qmat = np.asarray([r["qvec"] for r in qrows], dtype=np.float64)
    qn = _normalize_rows(qmat).reshape(len(qrows), m, dsub)
    lut = _round6_away(np.einsum("qjd,jcd->qjc", qn, codebooks))

    # nprobe nearest cells per query — client-sized (queries × centroids).
    ncen = np.sqrt((cent_mat * cent_mat).sum(axis=1))
    nq = np.sqrt((qmat * qmat).sum(axis=1))
    ccos = _round6_away(
        (qmat @ cent_mat.T) / (np.maximum(nq, 1e-30)[:, None] * ncen[None, :])
    )
    probe_rows = []
    for qi, r in enumerate(qrows):
        order = sorted(
            range(len(cent_ids)), key=lambda i: (-ccos[qi, i], cent_ids[i])
        )[: int(nprobe)]
        for i in order:
            probe_rows.append(
                (qi, int(r["q_id"]), int(cent_ids[i]),
                 [float(x) for x in r["qvec"]])
            )
    probes = spark.createDataFrame(
        probe_rows, "q_idx int, q_id long, c_id long, w array<double>"
    )

    @F.pandas_udf("double")
    def adc(codes: pd.Series, q_idx: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        cm = np.asarray(codes.tolist(), dtype=np.int64)
        qi = q_idx.to_numpy(dtype=np.int64)
        acc = lut[qi, 0, cm[:, 0]]
        for j in range(1, m):
            acc = acc + lut[qi, j, cm[:, j]]
        return pd.Series(_round6_away(acc))

    cand = (
        e.join(F.broadcast(probes), "c_id")
        .withColumn("adc6", adc(F.col("codes"), F.col("q_idx")))
    )
    w_c = Window.partitionBy("q_id").orderBy(
        F.col("adc6").desc(), F.col("vec_id").asc()
    )
    cand = cand.withColumn("r", F.row_number().over(w_c)).filter(
        F.col("r") <= int(rerank)
    )
    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = cand.select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos6").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float64)


def md5_hyperplanes(dim: int, n_bits: int) -> np.ndarray:
    """Engine-portable hyperplanes: plane[d, b] derives from md5("lsh:b:d")
    → uniform in [-1, 1). DuckDB computes the SAME values via
    md5_number_upper (== little-endian u64 of the first 8 md5 bytes,
    verified), so the LSH probe has an exact SQL oracle — no side table,
    no seed smuggling."""
    import hashlib

    u = np.empty((dim, n_bits), dtype=np.uint64)
    for b in range(n_bits):
        for d in range(dim):
            u[d, b] = np.frombuffer(
                hashlib.md5(f"lsh:{b}:{d}".encode()).digest()[:8], "<u8"
            )[0]
    return (u.astype(np.float64) / 2.0**64) * 2.0 - 1.0


def lsh_bucket_udf(
    dim: int, n_bits: int = 12, seed: int = 42, planes: np.ndarray | None = None
):
    if planes is None:
        planes = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        if m.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        bits = (m @ planes) >= 0
        keys = (bits << np.arange(n_bits)).sum(axis=1).astype(np.int64)
        return pd.Series(keys)

    return bucket


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 12,
    seed: int = 42,
    multiprobe: bool = True,
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket (+ Hamming-1 neighbors),
    exact cosine re-rank inside. Same output schema as brute force.
    ``planes`` overrides the seeded hyperplanes (see md5_hyperplanes for
    the oracle-checkable variant)."""
    dim = len(emb.select("embedding").first()["embedding"])
    bucket = lsh_bucket_udf(dim, n_bits, seed, planes)
    e = emb.select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("bucket", bucket(F.col("v")))

    q = queries.select("q_id", F.col("qvec").alias("w")).withColumn(
        "qbucket", bucket(F.col("w"))
    )
    if multiprobe:
        flips = ", ".join(
            f"cast(qbucket as bigint) ^ cast({1 << b} as bigint)" for b in range(n_bits)
        )
        q = q.select(
            "q_id", "w",
            F.explode(F.expr(f"array(cast(qbucket as bigint), {flips})")).alias("bucket"),
        )
    else:
        q = q.withColumnRenamed("qbucket", "bucket")

    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = e.join(F.broadcast(q), "bucket").select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def pq_train_residual(
    emb: DataFrame,
    cent_ids: np.ndarray,
    cent_mat: np.ndarray,
    m: int = 4,
    ksub: int = 16,
    seed: str = "rpq",
    src: str = "embedding",
) -> np.ndarray:
    """Residual PQ codebooks (FAISS IndexIVFPQ's by_residual=True — the
    FAISS DEFAULT, closing :func:`ivfpq_topk`'s documented delta): the
    quantized signal is x̂ − ĉ(cell(x)) — the vector's offset from its
    own NORMALIZED coarse centroid — which concentrates the quantizer's
    budget on within-cell variation instead of re-spending it on the cell
    position the IVF stage already knows. Init is the same md5-sampled
    deterministic subset as :func:`pq_train` (engine-portable: the
    DuckDB oracle recomputes it), with each sample's residual taken
    against its round6-cosine-assigned cell."""
    rows = (
        emb.select("vec_id", _as_double(src).alias("v"))
        .withColumn(
            "_h", F.md5(F.concat(F.lit(seed), F.col("vec_id").cast("string")))
        )
        .orderBy("_h", "vec_id")
        .limit(int(ksub))
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"corpus has {len(rows)} vectors < ksub={ksub}")
    raw = np.asarray([r["v"] for r in rows], dtype=np.float64)
    dim = raw.shape[1]
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    order = np.argsort(cent_ids, kind="stable")
    cmat = np.ascontiguousarray(cent_mat[order])
    ncen = np.sqrt((cmat * cmat).sum(axis=1))
    nv = np.sqrt((raw * raw).sum(axis=1))
    cos6 = _round6_away(
        (raw @ cmat.T) / (np.maximum(nv, 1e-30)[:, None] * ncen[None, :])
    )
    cells = cos6.argmax(axis=1)  # first max == smallest c_id (sorted cols)
    ncmat = cmat / ncen[:, None]
    resid = _normalize_rows(raw) - ncmat[cells]
    dsub = dim // m
    return np.ascontiguousarray(
        resid.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )


def rpq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    cent_ids: np.ndarray,
    cent_mat: np.ndarray,
    src: str = "embedding",
) -> DataFrame:
    """(vec_id, v, c_id, codes) with codes quantizing the RESIDUAL
    x̂ − ĉ(cell): cell assignment AND residual PQ codes in ONE map-side
    pandas UDF (the cell is needed to form the residual, so one pass
    does both — zero shuffle, zero row expansion)."""
    m, ksub, dsub = codebooks.shape
    cb = np.ascontiguousarray(codebooks)
    order = np.argsort(cent_ids, kind="stable")
    ids = np.ascontiguousarray(cent_ids[order])
    cmat = np.ascontiguousarray(cent_mat[order])
    ncen = np.sqrt((cmat * cmat).sum(axis=1))
    ncmat = cmat / ncen[:, None]

    @F.pandas_udf("c_id long, codes array<int>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"c_id": [], "codes": []}).astype(
                {"c_id": "int64"}
            )
        raw = np.asarray(vecs.tolist(), dtype=np.float64)
        nv = np.sqrt((raw * raw).sum(axis=1))
        cos6 = _round6_away(
            (raw @ cmat.T)
            / (np.maximum(nv, 1e-30)[:, None] * ncen[None, :])
        )
        cells = cos6.argmax(axis=1)
        resid = _normalize_rows(raw) - ncmat[cells]
        codes = _pq_assign(resid, cb)
        return pd.DataFrame(
            {
                "c_id": ids[cells].astype("int64"),
                "codes": [c.astype("int32").tolist() for c in codes],
            }
        )

    e = emb.select("vec_id", _as_double(src).alias("v"))
    return e.withColumn("_e", enc(F.col("v"))).select(
        "vec_id", "v", F.col("_e.c_id").alias("c_id"),
        F.col("_e.codes").alias("codes"),
    )


def rpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    rerank: int = 40,
    seed: str = "ivf",
    lloyd_iters: int = 0,
    cents: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Residual IVF-PQ search (FAISS IndexIVFPQ by_residual=True): the
    ADC estimate decomposes exactly — with x̂ = ĉ + r,
    ⟨q̂, x̂⟩ = ⟨q̂, ĉ⟩ + ⟨q̂, r⟩ — so the scan keeps ONE per-query LUT over
    the residual codebooks plus a per-(query, probed-cell) SCALAR offset
    ⟨q̂, ĉ⟩ carried on the broadcast probes table (NOT a per-(query, cell)
    LUT rebuild: that is the residual variant's usual cost, and the
    offset trick avoids it for inner-product/cosine metrics). Everything
    else matches :func:`ivfpq_topk`: nprobe cell pruning, m-byte ADC
    scan, exact float re-rank of the top ``rerank``.

    ``emb`` may be raw or a pre-encoded :func:`rpq_encode` frame
    (columns v/c_id/codes) with the SAME ``cents``/``codebooks``. Exact
    at nprobe ≥ n_centroids ∧ rerank ≥ corpus (tested)."""
    if rerank < k:
        raise ValueError("rerank must be >= k")
    m, ksub, dsub = codebooks.shape
    spark = emb.sparkSession
    pre_encoded = {"v", "c_id", "codes"}.issubset(set(emb.columns))
    if cents is None:
        if pre_encoded:
            raise ValueError(
                "pre-encoded input requires the cents=(ids, mat) it was "
                "encoded with"
            )
        e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
        rows = _ivf_centroids(e0, n_centroids, seed).collect()
        cent_ids = np.array([r["c_id"] for r in rows], dtype=np.int64)
        cent_mat = np.array([r["c"] for r in rows], dtype=np.float64)
        if lloyd_iters:
            cent_mat = lloyd_refine(e0, cent_ids, cent_mat, lloyd_iters)
    else:
        cent_ids, cent_mat = cents
    e = (
        emb
        if pre_encoded
        else rpq_encode(emb, codebooks, cent_ids, cent_mat)
    )

    qrows = sorted(
        queries.select("q_id", "qvec").collect(), key=lambda r: r["q_id"]
    )
    if not qrows:
        return spark.createDataFrame(
            [], "q_id long, vec_id long, cos6 double, rank int"
        )
    qmat = np.asarray([r["qvec"] for r in qrows], dtype=np.float64)
    qn_flat = _normalize_rows(qmat)
    qn = qn_flat.reshape(len(qrows), m, dsub)
    lut = _round6_away(np.einsum("qjd,jcd->qjc", qn, codebooks))

    order = np.argsort(cent_ids, kind="stable")
    s_ids = cent_ids[order]
    s_mat = cent_mat[order]
    ncen = np.sqrt((s_mat * s_mat).sum(axis=1))
    ncmat = s_mat / ncen[:, None]
    nq = np.sqrt((qmat * qmat).sum(axis=1))
    ccos = _round6_away(
        (qmat @ s_mat.T) / (np.maximum(nq, 1e-30)[:, None] * ncen[None, :])
    )
    qcoff = _round6_away(qn_flat @ ncmat.T)  # ⟨q̂, ĉ⟩ offsets
    probe_rows = []
    for qi, r in enumerate(qrows):
        sel = sorted(
            range(len(s_ids)), key=lambda i: (-ccos[qi, i], s_ids[i])
        )[: int(nprobe)]
        for i in sel:
            probe_rows.append(
                (qi, int(r["q_id"]), int(s_ids[i]), float(qcoff[qi, i]),
                 [float(x) for x in r["qvec"]])
            )
    probes = spark.createDataFrame(
        probe_rows,
        "q_idx int, q_id long, c_id long, qc6 double, w array<double>",
    )

    @F.pandas_udf("double")
    def adc(codes: pd.Series, q_idx: pd.Series, qc6: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        cm = np.asarray(codes.tolist(), dtype=np.int64)
        qi = q_idx.to_numpy(dtype=np.int64)
        acc = qc6.to_numpy(dtype=np.float64)  # ((off + p0) + p1) + …
        for j in range(m):
            acc = acc + lut[qi, j, cm[:, j]]
        return pd.Series(_round6_away(acc))

    cand = (
        e.join(F.broadcast(probes), "c_id")
        .withColumn("adc6", adc(F.col("codes"), F.col("q_idx"), F.col("qc6")))
    )
    w_c = Window.partitionBy("q_id").orderBy(
        F.col("adc6").desc(), F.col("vec_id").asc()
    )
    cand = cand.withColumn("r", F.row_number().over(w_c)).filter(
        F.col("r") <= int(rerank)
    )
    dot = F.expr("aggregate(zip_with(v, w, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nw = F.expr("sqrt(aggregate(transform(w, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    scored = cand.select(
        "q_id", "vec_id", F.round(dot / (nv * nw), ROUND).alias("cos6")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos6").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos6", "rank")
    )


def opq_train(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    seed: str = "opq",
    sample_size: int = 256,
    src: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ — Optimized Product Quantization (Ge et al. 2013, FAISS's
    OPQMatrix pretransform): learn an ORTHONORMAL rotation R so the PQ
    subspaces align with the data's principal directions before
    quantizing; plain PQ wastes codebook budget when variance is
    correlated ACROSS its arbitrary dim/m splits, and rotation is free at
    search time (cosine is rotation-invariant, so the exact rescore is
    unchanged).

    This is the PCA-initialized (a.k.a. OPQ-P / "natural") variant: R's
    columns are the covariance eigenvectors of an md5-sampled training
    subset in descending-eigenvalue order, signs fixed deterministically
    (largest-|component| entry made positive) — fully deterministic given
    the data, but NOT expressible in portable SQL (eigendecomposition),
    so this surface is pytest-verified rather than probe-verified
    (documented). The alternating-minimization refinement of the paper
    (assign → reconstruct → Procrustes SVD) is additive and intentionally
    left out: sampled-init codebooks dominate the error here.

    Returns (R, codebooks): R is (dim, dim); codebooks are trained on the
    ROTATED normalized samples with the same deterministic md5-subset
    rule as :func:`pq_train`. Compose with :func:`opq_rotate` →
    :func:`pq_encode` / :func:`pq_topk`."""
    rows = (
        emb.select("vec_id", _as_double(src).alias("v"))
        .withColumn(
            "_h", F.md5(F.concat(F.lit(seed), F.col("vec_id").cast("string")))
        )
        .orderBy("_h", "vec_id")
        .limit(int(sample_size))
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"corpus has {len(rows)} vectors < ksub={ksub}")
    sample = _normalize_rows(
        np.asarray([r["v"] for r in rows], dtype=np.float64)
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    cov = np.cov(sample, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    R = evecs[:, order]
    # deterministic sign: make the largest-|component| entry of each
    # eigenvector positive (eigh's sign is arbitrary)
    for c in range(R.shape[1]):
        i = int(np.abs(R[:, c]).argmax())
        if R[i, c] < 0:
            R[:, c] = -R[:, c]
    rot = sample[: int(ksub)] @ R
    dsub = dim // m
    codebooks = np.ascontiguousarray(
        rot.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )
    return R, codebooks


def opq_rotate(
    emb: DataFrame, R: np.ndarray, src: str = "embedding"
) -> DataFrame:
    """(vec_id, embedding): every vector NORMALIZED then rotated by the
    broadcast R — one vectorized pandas UDF (a numpy matmul per Arrow
    batch, zero shuffle). The output frame drops into every PQ surface
    unchanged; because R is orthonormal and inputs are pre-normalized,
    pq_encode's re-normalization is a no-op and exact cosines over
    rotated vectors equal the originals."""
    Rb = np.ascontiguousarray(R)

    @F.pandas_udf("array<double>")
    def rot(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = _normalize_rows(np.asarray(vecs.tolist(), dtype=np.float64))
        return pd.Series(list(mat @ Rb))

    return emb.select(
        "vec_id", rot(_as_double(src)).alias("embedding")
    )
