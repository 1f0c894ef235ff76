"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k via broadcast query × corpus join;
  dot products with built-in zip_with/aggregate (JVM) — the baseline and
  the oracle-checkable probe.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets (signature
  computed in ONE vectorized pandas UDF as a numpy matmul), queries probe
  only matching buckets (multi-probe over Hamming-1 neighbors), exact
  re-rank inside buckets. At 10^12 vectors the bucket join replaces the
  full cross join; recall is tested against brute force on seeded data.
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
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """queries(q_id, qvec array<double>) × emb(vec_id, embedding) → exact
    top-k by cosine: (q_id, vec_id, cos6, rank). Query side broadcast."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
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


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: str = "ivf",
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest centroid
    (cosine, round-6 tie-broken by centroid id), probe each query's
    ``nprobe`` nearest cells, exact re-rank inside. Same output schema as
    brute force: (q_id, vec_id, cos6, rank).

    Centroids are the ``n_centroids`` vectors with the smallest
    md5(seed || vec_id) — a deterministic pseudo-random subset (the
    standard sampled-centroid init) that any engine can recompute, which
    is what makes the probe's DuckDB oracle exact. A production variant
    would run Lloyd iterations from this init; the cell/probe/re-rank
    plumbing — the part that must scale — is identical."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    cents = (
        e.withColumn(
            "_h", F.md5(F.concat(F.lit(seed), F.col("vec_id").cast("string")))
        )
        .orderBy("_h", "vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("c_id"), F.col("v").alias("c"))
    )
    dot_vc = F.expr("aggregate(zip_with(v, c, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)")
    nv = F.expr("sqrt(aggregate(transform(v, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    nc = F.expr("sqrt(aggregate(transform(c, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))")
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("c_id").asc()
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v", "c_id",
            F.round(dot_vc / (nv * nc), ROUND).alias("ccos"),
        )
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("vec_id", "v", "c_id")
    )
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
