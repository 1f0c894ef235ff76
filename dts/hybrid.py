"""Hybrid retrieval: reciprocal rank fusion of lexical and vector top-k.

Reference UX: Elasticsearch 8.x hybrid search (``rank: {rrf: ...}``) and
Cormack/Clarke/Buettcher, SIGIR 2009 — fuse N ranked lists by
``score(d) = Σ_lists 1 / (rrf_k + rank_list(d))``; documents missing from
a list simply contribute nothing. RRF needs only RANKS, so a BM25 leg and
a cosine-similarity leg fuse without score calibration.

Scale notes (the whole point of RRF at 100 TB):
- Each leg is already a top-``window`` result (k·n_queries rows, NOT
  corpus-sized) — fusion is a union + hash-agg over client-page-sized
  frames; the corpus-scale work stays inside the legs' own engines
  (block-max WAND postings scan, IVF/PQ cell probe).
- The fused sum is computed by folding a SORTED array of contributions
  (``array_sort(collect_list(...))``), so the float result is
  deterministic for ANY number of legs regardless of Spark's
  aggregation order (doubles are commutative for 2 addends but not
  associative for ≥3 — the repo-wide shared-order float contract).
- Tie policy: rrf score rounded to 6 dp, ties broken by doc_id ASC —
  the probe's cross-engine rank rule.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROUND = 6
DEFAULT_RRF_K = 60  # ES default rank_constant


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = DEFAULT_RRF_K,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists → (query_id, doc_id, rrf6, rank), top-``k``.

    Every input frame must carry (query_col, id_col, rank_col) with
    rank starting at 1 inside each query. Extra columns are dropped.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    legs = [
        df.select(
            F.col(query_col).cast("long").alias("query_id"),
            F.col(id_col).cast("long").alias("doc_id"),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
            ).alias("contrib"),
        )
        for df in ranked
    ]
    u = reduce(DataFrame.unionByName, legs)
    # Deterministic fold: sort the (tiny, ≤len(ranked)) contribution list
    # before summing so the double result is run- and plan-independent.
    scored = (
        u.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list("contrib")).alias("cs"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.expr(
                    "aggregate(cs, cast(0.0 as double), (acc, x) -> acc + x)"
                ),
                ROUND,
            ).alias("rrf6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf6").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf6", "rank")
    )


def hybrid_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    emb: DataFrame,
    qvecs: DataFrame,
    k: int = 10,
    window: int = 100,
    rrf_k: int = DEFAULT_RRF_K,
    rank_round: int | None = None,
    allow: DataFrame | None = None,
) -> DataFrame:
    """BM25 leg (persisted index) + exact-cosine leg, RRF-fused.

    - ``queries``: (query_id, text, fuzzy_k) — the engine's query frame.
    - ``qvecs``: (query_id, qvec array<double>) — one query vector per
      query_id; ids must align with ``queries``.
    - ``emb``: (vec_id, embedding) with vec_id in the same id space as
      doc_id (the driver tables are built that way; real deployments
      key both legs by the document id).
    - ``window``: per-leg depth fed into fusion (ES ``rank_window_size``).
    - ``rank_round``: re-rank each leg on scores rounded to this many
      decimals before fusing (None = engine-native ranks). The probe
      uses 6 to share ranks bit-for-bit with the SQL oracle.
    - ``allow``: optional (doc_id) pre-filter applied to BOTH legs
      (filtered hybrid search, ES pre-filter semantics).
    """
    from dts.score_index import bm25_topk_indexed
    from dts.similarity import cosine_topk_bruteforce

    text_kwargs = {}
    if allow is not None:
        text_kwargs["doc_filter"] = allow
    text = bm25_topk_indexed(
        spark, index_dir, queries, k=window, **text_kwargs
    )
    if rank_round is not None:
        w = Window.partitionBy("query_id").orderBy(
            F.round("score", rank_round).desc(), F.col("doc_id").asc()
        )
        text = (
            text.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= window)
            .select("query_id", "doc_id", F.col("r").alias("rank"))
        )
    vec_allow = (
        allow.select(F.col("doc_id").alias("vec_id")) if allow is not None else None
    )
    vec = cosine_topk_bruteforce(
        emb,
        qvecs.select(F.col("query_id").alias("q_id"), "qvec"),
        k=window,
        allow=vec_allow,
    ).select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse([text, vec], k=k, rrf_k=rrf_k)
