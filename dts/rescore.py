"""Rescore window (ES rescore with a match_phrase rescorer).

The classic two-phase ranking pattern: a cheap disjunctive BM25 query
collects the top ``window`` candidates, then an expensive secondary
signal — here the query text as ONE PhraseQuery (phrase-frequency BM25,
dts.phrase.phrase_bm25_scores) — re-sorts only that window:

    combined = query_weight · primary + rescore_weight · phrase_score
    (score_mode='total'; 'multiply' composes instead, ES's other
    common mode — a doc without the phrase contributes 0 / leaves the
    primary unchanged respectively)

Scale shape: the primary is the engine's exact top-k machinery at
k=window (a window-sized heap per group, never a full emission); the
join touches only queries × window rows. The phrase job itself runs
over every doc containing the phrase — NOT just the window — because
the declared pscore spec takes df = corpus-wide phrase document
frequency, which no window-restricted job can produce (delta vs ES,
whose rescorer executes only over the window but also draws its stats
from per-term index frequencies rather than phrase df). The phrase
candidate set is still term-pruned postings, never a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dts.score_index import MAX_ISIN_TERMS, ROUND_RANK, bm25_topk_indexed


def rescore_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_mode: str = "total",
    max_isin_terms: int = MAX_ISIN_TERMS,
) -> DataFrame:
    """(query_id, doc_id, score, rank): top-``k`` of the top-``window``
    primary candidates re-sorted by the combined score. Requires
    k ≤ window (docs outside the window are never rescored — ES keeps
    them below the window in primary order; callers wanting that tail
    page with search_after on the primary). Needs a positional index
    (the phrase rescorer)."""
    from dts.phrase import phrase_bm25_scores

    if k > window:
        raise ValueError(f"k ({k}) must be <= window ({window})")
    if score_mode not in ("total", "multiply"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    primary = bm25_topk_indexed(
        spark, index_dir, queries, k=window, max_isin_terms=max_isin_terms
    )
    phrases = queries.select(
        F.col("query_id").alias("phrase_id"), "text"
    )
    ps = phrase_bm25_scores(
        spark, index_dir, phrases, max_isin_terms=max_isin_terms
    ).select(
        F.col("phrase_id").alias("query_id"), "doc_id", "pscore"
    )
    joined = primary.drop("rank").join(ps, ["query_id", "doc_id"], "left")
    p = F.coalesce(F.col("pscore"), F.lit(0.0))
    if score_mode == "total":
        combined = (
            F.lit(float(query_weight)) * F.col("score")
            + F.lit(float(rescore_weight)) * p
        )
    else:
        # multiply: (weighted primary) × (weighted phrase signal, 1 when
        # absent) — ES composes (query_weight · primary) ×
        # (rescore_weight · rescore); round-5 ADVICE: query_weight was
        # silently dropped in this mode.
        combined = (
            F.lit(float(query_weight)) * F.col("score")
        ) * F.coalesce(
            F.lit(float(rescore_weight)) * F.col("pscore"), F.lit(1.0)
        )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("combined"), ROUND_RANK).desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("combined", combined)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", F.col("combined").alias("score"), "rank"
        )
    )
