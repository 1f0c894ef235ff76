"""BM25 scoring — pure-DataFrame path (the correctness anchor).

This is SURVEY.md §7.3's "minimum slice": tokenize → tf/df/doc-stats →
broadcast query join → per-term contribution → deterministic-order sum →
window top-k. Everything after (compressed index, WAND) is an optimization
of THIS semantics and is tested to never change it.

Rank-identity contract (shared with dts.oracle):
- k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)), float64.
- Per-doc score = fold of per-term contributions in ASCENDING TERM order —
  here enforced with array_sort(collect_list(...)) + F.aggregate, which
  reproduces the oracle's addition sequence bit-for-bit (a plain groupBy
  sum would add in shuffle order: same value to ~1 ulp, not bitwise).
- Ranking key: (round(score, 9) DESC, doc_id ASC). Rounding collapses
  last-ulp noise (e.g. duplicate docs whose sums ran in different orders)
  so ranks are stable across engines; reported score stays full float64.

The broadcast of the query-term side mirrors the reference's
DISTRIBUTE_PATTERNS=0 strategy (src/flexible_mpi.c:147-153); the shuffle
alternative (strategy 1) lives in the index-backed scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dts.tokenizer import tokenize_udf

K1 = 1.2
B = 0.75
ROUND_RANK = 9  # decimals for the rank key; see contract above


def tokenized(docs: DataFrame) -> DataFrame:
    """(doc_id, toks array<string>, dl long). dl includes zero-token docs."""
    return docs.select(
        "doc_id",
        tokenize_udf("content").alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))


def term_freqs(tok: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — one row per distinct (doc, term)."""
    return (
        tok.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) from the per-doc tf table (already distinct per doc)."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def corpus_stats(tok: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) — two scalars; fine to collect at any scale."""
    row = tok.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def query_terms_df(queries: DataFrame) -> DataFrame:
    """(query_id, term) — duplicates KEPT (a repeated query term counts
    twice, matching the oracle's per-occurrence expansion)."""
    return queries.select(
        "query_id", F.explode(tokenize_udf("text")).alias("term")
    )


def classic_weight(n_docs: float, df):
    """Lucene ClassicSimilarity (TFIDFSimilarity) per-term query weight:
    idf² with idf = 1 + ln(n_docs / (df + 1)). The squared idf is the
    product of the query-side and doc-side idf factors in Lucene's
    formula (queryNorm and coord were removed in Lucene 7; this engine
    never had them). Works on numpy arrays and python floats."""
    import numpy as np

    return (1.0 + np.log(n_docs / (np.asarray(df, dtype=np.float64) + 1.0))) ** 2


def classic_impact(tf, dl):
    """Lucene ClassicSimilarity per-(term, doc) impact: sqrt(tf) ·
    1/sqrt(dl) — the tf factor times the index-time field norm (this
    engine stores exact dl, so the norm is exact, not Lucene's lossy
    byte-encoded approximation; documented delta). Numpy arrays in,
    float64 out."""
    import numpy as np

    return np.sqrt(np.asarray(tf, dtype=np.float64)) / np.sqrt(
        np.asarray(dl, dtype=np.float64)
    )


def bm25_contrib(n_docs: int, avgdl: float):
    """Column expr: one term's BM25 contribution, from tf/df/dl columns."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    impact = (
        F.col("tf").cast("double")
        * F.lit(K1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(K1)
            * (F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / F.lit(avgdl))
        )
    )
    return idf * impact


def score_contributions(
    tf: DataFrame,
    df_: DataFrame,
    tok: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """(query_id, doc_id, term, contrib) for every matching posting."""
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_.join(qterms.select("term").distinct(), "term")), "term")
        .join(tok.select("doc_id", "dl"), "doc_id")
        .select(
            "query_id",
            "doc_id",
            "term",
            bm25_contrib(n_docs, avgdl).alias("contrib"),
        )
    )


def deterministic_sum_topk(contribs: DataFrame, k: int = 10) -> DataFrame:
    """Fold contributions in ascending-term order, rank, keep top-k.

    Returns (query_id, doc_id, score, rank).
    """
    folded = (
        contribs.groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), ROUND_RANK).desc(), F.col("doc_id").asc()
    )
    return (
        folded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk_dataframe(docs: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """End-to-end minimal slice: exact-term BM25 top-k, pure DataFrame ops.

    `docs` needs (doc_id, content); `queries` needs (query_id, text).
    Fuzzy queries go through dts.fuzzy expansion feeding the same scorer.
    """
    tok = tokenized(docs).cache()
    tf = term_freqs(tok)
    df_ = doc_frequencies(tf)
    n_docs, avgdl = corpus_stats(tok)
    qterms = query_terms_df(queries)
    contribs = score_contributions(tf, df_, tok, qterms, n_docs, avgdl)
    return deterministic_sum_topk(contribs, k)

LMD_MU = 2000.0


def lmd_impact(tf, dl, cf: float, total_tokens: float, mu: float = LMD_MU):
    """Lucene LMDirichletSimilarity per-(term, doc) score: with collection
    language model p = cf / total_tokens,

        max( ln(1 + tf / (mu * p)) + ln(mu / (dl + mu)), 0 )

    — Dirichlet-smoothed query likelihood (Zhai & Lafferty), floored at 0
    per matching term exactly as Lucene's LMDirichletSimilarity.score
    does. mu defaults to Lucene's 2000. The second addend is tf-free but
    per-MATCHING-term (Lucene adds it once per matched term); the floor
    keeps high-frequency terms in very long docs from going negative.
    Numpy arrays in, float64 out."""
    import numpy as np

    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    p = float(cf) / float(total_tokens)
    s = np.log(1.0 + tf / (mu * p)) + np.log(mu / (dl + mu))
    return np.maximum(s, 0.0)
