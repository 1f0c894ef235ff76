"""Byte-faithful approximate pattern counting (the reference's core query).

Replicates the reference's per-position sliding-window Levenshtein count
(reference src/apm1.c:252-278) EXACTLY, per document: for every start
position j in [0, n) the comparison length is size = min(m, n - j)
(src/apm1.c:263-268) and BOTH strings are truncated to it — the DP kernel
runs both loops to `len = size` (src/apm1.c:82-105), so the check is
levenshtein(pattern[:size], content[j:j+size]) <= k (the θ-filter,
src/apm1.c:272-274). n_matches counts matching positions (overlaps all
count). Pinned regression: text "xmer", pattern "merge", k=0 matches at
j=1 ("mer" vs "mer") — full-pattern-vs-window semantics would count 0.

Semantic deltas vs the reference (documented in SURVEY.md §7.6):

- The reference concatenates all files into ONE byte array, so matches may
  straddle file boundaries; our unit of matching is the document row —
  windows never cross documents.
- ``byte_match_counts`` sweeps Unicode CODEPOINTS (Spark/DuckDB
  length/substring/levenshtein are character-based); the reference sweeps
  raw bytes, so on non-ASCII content window sizes and distances can
  differ (a 2-byte UTF-8 char is two reference positions, one here). The
  BYTE-EXACT variant is ``byte_match_counts_binary`` (round 4): it
  re-views the UTF-8 byte stream as ISO-8859-1 — a byte↔codepoint
  bijection over U+0000–U+00FF — which turns the same JVM
  length/substring/levenshtein plan into byte-granularity operators,
  reproducing apm1's counts on arbitrary UTF-8 (pinned non-ASCII
  regression where the two variants differ). On the pure-ASCII corpora
  the variants coincide exactly (tested).

Execution: 100% JVM expressions — the position sweep is a higher-order
``filter`` over ``sequence(1, n)`` and each window check uses Spark's
bounded ``levenshtein(p, w, k)`` (threshold form: returns -1 when the
distance exceeds k, so each check is O(k·m) not O(m²)). The pattern table
is broadcast, mirroring DISTRIBUTE_PATTERNS=0 (src/flexible_mpi.c:147-153);
the content scan parallelizes over document partitions, which is the
reference's MPI split (src/apm1.c:212-232) re-expressed as Spark
partitioning. No Python in the plan, no shuffle except the final
(tiny) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per (pattern, doc): number of byte positions whose truncated window is
# within edit distance k. The PATTERN is truncated alongside the window at
# the document tail — the reference kernel runs both DP loops to
# len = size = min(m, n - j) (src/apm1.c:82-105 called at :270 with
# size = n_bytes - j, :263-268), i.e. it compares pattern[:size] vs
# buf[j:j+size]. left() mirrors that prefix; substring() naturally
# truncates the window. sequence(1,0) would be DESCENDING in Spark, so
# empty texts short-circuit to 0.
_COUNT_EXPR = """
IF(length(t) = 0, CAST(0 AS BIGINT),
   CAST(size(filter(sequence(1, length(t)),
                    j -> levenshtein(left(pattern, length(t) - j + 1),
                                     substring(t, j, length(pattern)), k) >= 0))
        AS BIGINT))
"""


def byte_match_counts(
    docs: DataFrame, patterns: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(pat_id, doc_id, n_matches) for every (pattern, document) pair.

    ``patterns`` needs (pat_id, pattern, k). Zero-match pairs are kept —
    the reference's n_matches vector has an entry per pattern regardless
    (src/apm1.c:197-203).
    """
    d = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("t")
    )
    return (
        d.crossJoin(F.broadcast(patterns.select("pat_id", "pattern", "k")))
        .select(
            "pat_id",
            "doc_id",
            F.expr(_COUNT_EXPR).alias("n_matches"),
        )
    )


# Byte↔codepoint bijection: UTF-8 bytes re-viewed as ISO-8859-1 chars.
# length() of the view = octet count; substring() = byte windows;
# levenshtein() = byte-level edit distance. Pure JVM, same codegen span
# as the codepoint path.
_BYTE_VIEW = "decode(encode({c}, 'UTF-8'), 'ISO-8859-1')"


def byte_match_counts_binary(
    docs: DataFrame, patterns: DataFrame, text_col: str = "text"
) -> DataFrame:
    """BYTE-exact sliding-window counting — the last reference semantic
    the engine couldn't reproduce (src/apm1.c:252 sweeps raw bytes of the
    concatenated buffer): windows, comparison lengths and edit distances
    over the UTF-8 BYTE stream. Same output shape and plan shape as
    ``byte_match_counts``; identical results on ASCII, reference-faithful
    (and generally different) on multi-byte UTF-8."""
    d = docs.select(
        "doc_id",
        F.expr(_BYTE_VIEW.format(c=f"coalesce({text_col}, '')")).alias("t"),
    )
    p = patterns.select(
        "pat_id", F.expr(_BYTE_VIEW.format(c="pattern")).alias("pattern"), "k"
    )
    return d.crossJoin(F.broadcast(p)).select(
        "pat_id", "doc_id", F.expr(_COUNT_EXPR).alias("n_matches")
    )


def byte_match_totals(
    docs: DataFrame,
    patterns: DataFrame,
    text_col: str = "text",
    binary: bool = False,
) -> DataFrame:
    """(pat_id, n_matches) — the reference's actual output shape: one
    global counter per pattern (src/apm1.c:197-203, O13 final agg).
    ``binary=True`` counts at byte granularity (byte_match_counts_binary)."""
    counts = (
        byte_match_counts_binary(docs, patterns, text_col)
        if binary
        else byte_match_counts(docs, patterns, text_col)
    )
    return counts.groupBy("pat_id").agg(F.sum("n_matches").alias("n_matches"))
