"""Prefix / wildcard term queries: dictionary-range expansion + rewrite.

Lucene resolves ``fa*`` by seeking the term dictionary to the literal
prefix and scanning until the range ends, then rewriting the query as the
disjunction of matched terms. The Spark-native analogue exploits the fact
that ``term_stats`` (and ``postings``) are written TERM-SORTED: a prefix
becomes a ``term >= p AND term < next(p)`` range predicate that parquet
row-group min/max stats prune — the dictionary "seek" is a pruned columnar
scan, no Python in the plan.

Pattern language: ``*`` matches any (possibly empty) run of characters;
everything else is literal. The literal prefix before the first ``*``
drives the range pushdown; the residual pattern applies as an anchored
JVM-side ``rlike``. A LEADING-wildcard pattern (``*ing``) has no prefix
and honestly scans the whole vocabulary — the same cost Lucene pays
(which is why it historically gated leading wildcards); the vocabulary
table is tiny relative to postings, so this stays a metadata-sized scan
even at 10^12 docs.

Scoring rewrite semantics match Lucene's BooleanQuery rewrite: each
matched term contributes its own idf·impact exactly once (distinct term
set per query).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dts.score_index import (
    MAX_ISIN_TERMS,
    TOPK_SCHEMA,
    load_index,
    score_expanded_terms,
)


def _prefix_upper(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix: bump
    the last char that is not already the max codepoint, dropping the
    tail. None ⇒ no finite upper bound (empty or all-max prefix)."""
    for i in range(len(prefix) - 1, -1, -1):
        if ord(prefix[i]) < 0x10FFFF:
            return prefix[:i] + chr(ord(prefix[i]) + 1)
    return None


def _pattern_filter(pattern: str):
    """Column predicate for one pattern: equality for literal patterns, a
    range predicate (row-group-prunable) for the literal prefix plus an
    anchored rlike residual when the pattern has inner/trailing parts."""
    star = pattern.find("*")
    if star < 0:
        return F.col("term") == pattern
    prefix = pattern[:star]
    cond = F.lit(True)
    if prefix:
        cond = F.col("term") >= prefix
        up = _prefix_upper(prefix)
        if up is not None:
            cond = cond & (F.col("term") < up)
    if pattern == prefix + "*":  # pure prefix: the range IS the match
        return cond
    rx = "^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$"
    return cond & F.col("term").rlike(rx)


def expand_wildcard_terms(
    spark: SparkSession, index_dir: str, patterns: DataFrame
) -> DataFrame:
    """(wq_id, term): distinct vocabulary terms matching each pattern.
    ``patterns`` needs (wq_id, pattern). One pruned term_stats scan leg
    per pattern, unioned — patterns are query-sized by the same contract
    as every query batch, so the union plan stays small while each leg
    keeps its own range pushdown."""
    vocab = load_index(spark, index_dir)["term_stats"].select("term")
    legs = []
    for r in patterns.select("wq_id", "pattern").collect():
        cond = _pattern_filter(r["pattern"])
        legs.append(
            vocab.filter(cond).select(
                F.lit(int(r["wq_id"])).cast("long").alias("wq_id"), "term"
            )
        )
    if not legs:
        return spark.createDataFrame([], "wq_id long, term string")
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def wildcard_match_counts(
    spark: SparkSession, index_dir: str, patterns: DataFrame
) -> DataFrame:
    """(wq_id, n_matches): TOTAL corpus token positions matching each
    pattern — the reference's per-pattern counting surface
    (src/apm1.c:197-203) resolved entirely from term_stats.cf; postings
    are never touched. Patterns with no matching term report 0."""
    idx = load_index(spark, index_dir)
    expanded = expand_wildcard_terms(spark, index_dir, patterns)
    counts = (
        expanded.join(idx["term_stats"].select("term", "cf"), "term")
        .groupBy("wq_id")
        .agg(F.sum("cf").alias("n_matches"))
    )
    return (
        patterns.select("wq_id")
        .join(counts, "wq_id", "left")
        .select(
            "wq_id", F.coalesce("n_matches", F.lit(0)).alias("n_matches")
        )
    )


def bm25_topk_wildcard(
    spark: SparkSession,
    index_dir: str,
    patterns: DataFrame,
    k: int = 10,
    strategy: str = "taat",
    distribute: str | None = None,
    max_isin_terms: int = MAX_ISIN_TERMS,
) -> DataFrame:
    """Top-k BM25 where each pattern scores as the disjunction of its
    matched terms (each term's own idf, once — Lucene BooleanQuery
    rewrite). Returns (query_id, doc_id, score, rank) with query_id =
    wq_id. A pattern matching more terms than ``max_isin_terms`` falls
    back to the broadcast-semi-join plan automatically."""
    expanded = expand_wildcard_terms(spark, index_dir, patterns).select(
        F.col("wq_id").alias("query_id"), "term"
    )
    n_queries = patterns.count()
    if n_queries == 0:
        return spark.createDataFrame([], TOPK_SCHEMA)
    return score_expanded_terms(
        spark, index_dir, expanded, n_queries, k=k, strategy=strategy,
        distribute=distribute, max_isin_terms=max_isin_terms,
    )
