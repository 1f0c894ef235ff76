"""Analysis chains — Lucene-style analyzers as composable transforms.

The engine's core tokenizer is the standard chain (regex tokens,
lowercase). Richer analysis — stopword removal + light English
stemming, Lucene's EnglishAnalyzer shape — composes OUTSIDE the index
paths: ``en_light_analyze_col`` rewrites text into its analyzed token
stream (space-joined), which the standard tokenizer then reproduces
exactly, because every emitted token is itself a plain ``[a-z0-9]+``
token. One build over analyzed text + the mirrored query transform give
full analyzer semantics with zero changes to any scoring surface —
queries and documents agree the way Lucene guarantees by running the
same Analyzer at index and query time.

Components (both 100% JVM expressions and a bit-identical python
mirror for query strings and oracles):

- stopword filter: Lucene's default 33-word English stop set
  (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET).
- EnglishMinimalStemFilter: Savoy's minimal plural stemmer, the exact
  branch structure of Lucene's EnglishMinimalStemmer.stem() —
  "berries"→"berry", "houses"→"house", "dogs"→"dog"; "us"/"ss"
  endings and short words untouched.

Scale shape: the analyzer is a map-side expression over the content
scan — no shuffle, whole-stage codegen; at 100 TB it rides the one
existing tokenize pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOK = "[a-z0-9]+"

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (the classic 33).
EN_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)


def en_minimal_stem(t: str) -> str:
    """Python mirror of Lucene's EnglishMinimalStemmer.stem()."""
    n = len(t)
    if n < 3 or t[-1] != "s":
        return t
    p = t[-2]
    if p in ("u", "s"):
        return t
    if p == "e":
        if n > 3 and t[-3] == "i" and t[-4] not in ("a", "e"):
            return t[:-3] + "y"
        if t[-3] in ("i", "a", "o", "e"):
            return t
    return t[:-1]


def en_light_analyze(text: str | None) -> str:
    """Analyze one string (query/oracle path): tokenize, drop stopwords,
    minimal-stem, space-join. Identical spec to the column expression."""
    import re

    toks = re.findall(TOK, (text or "").lower())
    stop = set(EN_STOPWORDS)
    return " ".join(en_minimal_stem(t) for t in toks if t not in stop)


def _stem_sql(v: str) -> str:
    """The EnglishMinimalStemmer as a SQL CASE over token ``v`` —
    shared-spec fragment (valid Spark SQL and DuckDB)."""
    last = f"substr({v}, length({v}), 1)"
    pen = f"substr({v}, length({v}) - 1, 1)"
    ante = f"substr({v}, length({v}) - 2, 1)"
    pre = f"substr({v}, length({v}) - 3, 1)"
    return f"""
      CASE
        WHEN length({v}) < 3 OR {last} <> 's' THEN {v}
        WHEN {pen} = 'u' OR {pen} = 's' THEN {v}
        WHEN {pen} = 'e' THEN CASE
          WHEN length({v}) > 3 AND {ante} = 'i'
               AND {pre} <> 'a' AND {pre} <> 'e'
            THEN concat(substr({v}, 1, length({v}) - 3), 'y')
          WHEN {ante} = 'i' OR {ante} = 'a' OR {ante} = 'o' OR {ante} = 'e'
            THEN {v}
          ELSE substr({v}, 1, length({v}) - 1)
        END
        ELSE substr({v}, 1, length({v}) - 1)
      END
    """


def en_light_analyze_col(text_col: str) -> Column:
    """Analyzed token stream of ``text_col`` as one space-joined string —
    index the result with the standard chain and the index IS the
    analyzed index (every output token is again a plain token)."""
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    kept = f"filter({toks}, t -> NOT array_contains(array({stop}), t))"
    stemmed = f"transform({kept}, t -> {_stem_sql('t')})"
    return F.expr(f"concat_ws(' ', {stemmed})")


def stem_sql_duckdb(v: str) -> str:
    """The same stemmer CASE for DuckDB oracles (identical text — the
    fragment is dialect-shared; exposed under a separate name so oracle
    builders don't import a private)."""
    return _stem_sql(v)
