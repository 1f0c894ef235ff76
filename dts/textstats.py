"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is built-in Spark SQL expressions (JVM-side, codegen-friendly,
DuckDB-oracle-checkable); no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOK = "[a-z0-9]+"

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic argmax with lexicographic tie-break.
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une"],
}


def _toks(text_col: str) -> str:
    return f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_subword): whitespace-ish tokens plus
    a BPE-ish subword count (runs of ≤4 chars per token, ceil(len/4))."""
    toks = _toks(text_col)
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").cast("long").alias("n_distinct"),
        F.expr(
            f"aggregate({toks}, 0L, (acc, t) -> acc + cast(ceil(length(t) / 4.0) as long))"
        ).alias("n_subword"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, alpha_ratio6, stop_ratio6, mean_tok_len6, quality6).

    quality = 0.4·alpha_ratio + 0.4·stopword_ratio + 0.2·min(1, n_tokens/64)
    — a standard cheap heuristic (length/punctuation/stopword mix)."""
    toks = _toks(text_col)
    stop = ",".join(f"'{w}'" for w in LANG_MARKERS["en"])
    n_chars = f"length(coalesce({text_col}, ''))"
    alpha = f"length(regexp_replace(lower(coalesce({text_col}, '')), '[^a-z]', ''))"
    n_tok = f"size({toks})"
    n_stop = f"size(filter({toks}, t -> array_contains(array({stop}), t)))"
    return docs.select(
        "doc_id",
        F.expr(n_chars).cast("long").alias("n_chars_c"),
        F.round(F.expr(f"{alpha} / greatest({n_chars}, 1)"), 6).alias("alpha_ratio6"),
        F.round(F.expr(f"{n_stop} / greatest({n_tok}, 1)"), 6).alias("stop_ratio6"),
        F.round(
            F.expr(
                f"aggregate({toks}, 0L, (acc, t) -> acc + length(t)) / greatest({n_tok}, 1)"
            ),
            6,
        ).alias("mean_tok_len6"),
        F.round(
            F.expr(
                f"0.4 * ({alpha} / greatest({n_chars}, 1))"
                f" + 0.4 * ({n_stop} / greatest({n_tok}, 1))"
                f" + 0.2 * least(1.0, {n_tok} / 64.0)"
            ),
            6,
        ).alias("quality6"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax of marker-word hits, tie-break lang asc."""
    toks = _toks(text_col)
    scores = ", ".join(
        f"struct(size(filter({toks}, t -> array_contains(array("
        + ",".join(f"'{w}'" for w in ws)
        + f"), t))) AS hits, '{lang}' AS lang)"
        for lang, ws in sorted(LANG_MARKERS.items())
    )
    # array_max on struct(hits, lang) picks highest hits; ties need SMALLEST
    # lang, so compare on (hits, negated-lang) — emulate with sort+reverse:
    # instead pick via aggregate comparing (hits DESC, lang ASC).
    pick = f"""
        aggregate(array({scores}),
                  struct(-1 AS hits, '' AS lang),
                  (best, s) -> CASE WHEN s.hits > best.hits THEN s
                                    WHEN s.hits = best.hits AND best.lang != '' AND s.lang < best.lang THEN s
                                    ELSE best END)
    """
    return docs.select("doc_id", F.expr(f"({pick}).lang").alias("pred_lang"))


def fingerprints(docs: DataFrame, text_col: str = "text", k: int = 8, n: int = 3) -> DataFrame:
    """(doc_id, fp): document fingerprint = bottom-k md5 hashes of token
    n-gram shingles joined with '|' (a bottom-k sketch — same family as
    winnowing; portable to the DuckDB oracle)."""
    toks = _toks(text_col)
    sh = f"""
        CASE WHEN size({toks}) < {n} THEN array(array_join({toks}, ' '))
        ELSE array_distinct(transform(sequence(0, size({toks}) - {n}),
                                      i -> concat_ws(' ', slice({toks}, i + 1, {n}))))
        END
    """
    return docs.select(
        "doc_id",
        F.expr(
            f"array_join(slice(array_sort(transform({sh}, s -> md5(s))), 1, {k}), '|')"
        ).alias("fp"),
    )


# PII patterns — intersection of Java-regex and RE2 semantics (greedy,
# no lookaround, no alternation-order dependence) so the Spark kernel
# and the DuckDB oracle match byte-for-byte. Scrub order is fixed
# (email → ipv4 → phone): counts are taken on the text as it stands
# BEFORE that pattern's replacement, so overlapping families (an email's
# host can contain digits) never double-count.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_clean, n_email, n_ipv4, n_phone): redact PII-shaped
    spans with typed placeholder tokens — the pre-training scrub pass
    every published data pipeline runs (C4 removed pages on a blocklist;
    modern pipelines redact in place). 100% JVM regexp expressions — one
    map-side pass over the corpus, no shuffle, whole-stage codegen; at
    100 TB this is scan-bound, exactly as it should be."""
    out = docs.select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    counts = []
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count("_t", F.lit(pat)))
        out = out.withColumn("_t", F.regexp_replace("_t", pat, repl))
        counts.append(f"n_{name}")
    return out.select(
        "doc_id", F.col("_t").alias("text_clean"), *counts
    )
