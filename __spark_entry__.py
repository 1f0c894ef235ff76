"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k on sf0.001. ``queries()`` /
``oracle_sql()`` register SQL-expressible probes over the driver's
``documents`` table, one per operator family from SURVEY.md §2 (tokenize /
tf / df / doc-stats O18+O11-O13, BM25 scoring + top-k O19-O21, fuzzy
Levenshtein expansion + counting O8-O10).

Probe tokenizer: the probes use a plain ``[a-z0-9]+`` regex over lowercased
text so the exact same tokenization is expressible in DuckDB SQL; the
engine's code-aware tokenizer (dts.tokenize) is exercised by pytest against
the single-process oracle instead (it is not SQL-expressible).

Float policy: every probe that outputs a score rounds to 6 decimals in BOTH
engines and ranks on the rounded value — collapses cross-engine ulp noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOK = "[a-z0-9]+"
K1 = 1.2
B = 0.75

# Fixed probe query set over the documents vocabulary (simple english words
# by construction of the driver's synthetic table).
PROBE_QUERIES = [
    (0, "fast join"),
    (1, "table scan merge"),
    (2, "window group sort"),
    (3, "customer order"),
    (4, "spark query data"),
    (5, "hash"),
    (6, "stream filter row"),
    (7, "slow batch value"),
]
FUZZY_TERMS = [(0, "fastt"), (1, "joon"), (2, "tabel"), (3, "qurey"), (4, "merg")]

VALUES_QUERIES = ", ".join(f"({i}, '{t}')" for i, t in PROBE_QUERIES)
VALUES_FUZZY = ", ".join(f"({i}, '{t}')" for i, t in FUZZY_TERMS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) exploded, simple regex tokens."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(coalesce(text, '')), '{TOK}', 0)")
        ).alias("term"),
    )


def _dl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(
            F.expr(f"regexp_extract_all(lower(coalesce(text, '')), '{TOK}', 0)")
        ).cast("long").alias("dl"),
    )


def _probe_queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PROBE_QUERIES, "query_id long, text string")


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score6) — BM25 with the shared constants, score
    rounded to 6 decimals. Mirrors the SQL in oracle_sql() exactly."""
    tok = _tok(spark, sf_dir)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = _dl(spark, sf_dir)
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    qterms = _probe_queries_df(spark).select(
        "query_id", F.explode(F.split("text", " ")).alias("term")
    )
    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    impact = (
        F.col("tf") * F.lit(K1 + 1.0)
        / (F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_.join(qterms.select("term").distinct(), "term")), "term")
        .join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * impact), 6).alias("score6"))
    )


_BM25_SQL_CTE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '{TOK}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(coalesce(text, '')), '{TOK}'))::BIGINT AS dl
  FROM documents
),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         round(sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ), 6) AS score6
  FROM qterms
  JOIN tf USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents for the probe query set."""
    scored = _bm25_scored(spark, "/root/testdata/sf0.001")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "score6", "rank")
    )


# --------------------------------------------------------------------------
# probes
# --------------------------------------------------------------------------


def _q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency per term (O11-O13: partial+final aggregation)."""
    return (
        _tok(spark, sf_dir)
        .groupBy("doc_id", "term")
        .count()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .select("term", "df")
    )


def _q_term_tf_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequency (O18 tokenize + O13 global agg)."""
    return _tok(spark, sf_dir).groupBy("term").agg(F.count("*").alias("tf_total"))


def _q_doc_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token count (doc_stats side of BM25)."""
    return _dl(spark, sf_dir)


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 ranks — integer-only output (O19 top-k, O21 join)."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )


def _q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scores (rounded to 6) for the probe queries (O9-O13 analogue)."""
    return _bm25_scored(spark, sf_dir).select("query_id", "doc_id", "score6")


def _q_fuzzy_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary terms within Levenshtein ≤ 2 of each fuzzy probe term
    (O9 Levenshtein kernel + O10 θ-filter), built-in F.levenshtein."""
    vocab = _tok(spark, sf_dir).select("term").distinct()
    fz = spark.createDataFrame(FUZZY_TERMS, "fq_id long, qterm string")
    return (
        vocab.crossJoin(F.broadcast(fz))
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= 2)
        .select("fq_id", "qterm", "term", "dist")
    )


def _q_fuzzy_match_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-faithful counting query at token granularity: per (fuzzy
    term, doc), number of token positions within distance 1 — the analogue
    of the reference's per-pattern position counting (src/apm1.c:252-278;
    overlaps all count)."""
    tok = _tok(spark, sf_dir)
    fz = spark.createDataFrame(FUZZY_TERMS, "fq_id long, qterm string")
    return (
        tok.crossJoin(F.broadcast(fz))
        .filter(F.levenshtein("qterm", "term") <= 1)
        .groupBy("fq_id", "qterm", "doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_df": _q_term_df,
        "term_tf_total": _q_term_tf_total,
        "doc_len": _q_doc_len,
        "bm25_topk": _q_bm25_topk,
        "bm25_scores": _q_bm25_scores,
        "fuzzy_expand": _q_fuzzy_expand,
        "fuzzy_match_count": _q_fuzzy_match_count,
    }


def oracle_sql() -> dict[str, str]:
    tok_cte = (
        f"WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '{TOK}')) AS term FROM documents)"
    )
    return {
        "term_df": f"{tok_cte} SELECT term, count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term",
        "term_tf_total": f"{tok_cte} SELECT term, count(*)::BIGINT AS tf_total FROM tok GROUP BY term",
        "doc_len": f"SELECT doc_id, len(regexp_extract_all(lower(coalesce(text, '')), '{TOK}'))::BIGINT AS dl FROM documents",
        "bm25_topk": _BM25_SQL_CTE
        + """
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""",
        "bm25_scores": _BM25_SQL_CTE + "SELECT query_id, doc_id, score6 FROM scored",
        "fuzzy_expand": f"""
{tok_cte},
vocab AS (SELECT DISTINCT term FROM tok),
fz(fq_id, qterm) AS (VALUES {VALUES_FUZZY})
SELECT fq_id::BIGINT AS fq_id, qterm, term, levenshtein(qterm, term)::INTEGER AS dist
FROM vocab CROSS JOIN fz
WHERE levenshtein(qterm, term) <= 2
""",
        "fuzzy_match_count": f"""
{tok_cte},
fz(fq_id, qterm) AS (VALUES {VALUES_FUZZY})
SELECT fq_id::BIGINT AS fq_id, qterm, doc_id, count(*)::BIGINT AS n_matches
FROM tok CROSS JOIN fz
WHERE levenshtein(qterm, term) <= 1
GROUP BY 1, 2, 3
""",
    }
