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
    a BPE-ish subword count (runs of ≤4 chars per token, ceil(len/4)).
    Tokenize ONCE into a projected column — the old shape inlined the
    regexp into every output expression (3 tokenize passes per doc)."""
    return docs.select(
        "doc_id", F.expr(_toks(text_col)).alias("_tc_t")
    ).select(
        "doc_id",
        F.expr("size(_tc_t)").cast("long").alias("n_tokens"),
        F.expr("size(array_distinct(_tc_t))").cast("long").alias("n_distinct"),
        F.expr(
            "aggregate(_tc_t, 0L, (acc, t) -> acc + cast(ceil(length(t) / 4.0) as long))"
        ).alias("n_subword"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, alpha_ratio6, stop_ratio6, mean_tok_len6, quality6).

    quality = 0.4·alpha_ratio + 0.4·stopword_ratio + 0.2·min(1, n_tokens/64)
    — a standard cheap heuristic (length/punctuation/stopword mix).
    Shared subexpressions (tokens, char counts, stop hits) are staged as
    one intermediate projection — the old shape re-ran the tokenize ~6×
    and the alpha regexp_replace 2× per doc across the output columns."""
    stop = ",".join(f"'{w}'" for w in LANG_MARKERS["en"])
    staged = docs.select(
        "doc_id",
        F.expr(f"length(coalesce({text_col}, ''))").alias("_nc"),
        F.expr(
            f"length(regexp_replace(lower(coalesce({text_col}, '')), '[^a-z]', ''))"
        ).alias("_al"),
        F.expr(_toks(text_col)).alias("_t"),
    ).select(
        "doc_id",
        "_nc",
        "_al",
        F.expr("size(_t)").alias("_nt"),
        F.expr(
            f"size(filter(_t, t -> array_contains(array({stop}), t)))"
        ).alias("_ns"),
        F.expr("aggregate(_t, 0L, (acc, t) -> acc + length(t))").alias("_tl"),
    )
    return staged.select(
        "doc_id",
        F.col("_nc").cast("long").alias("n_chars_c"),
        F.round(F.expr("_al / greatest(_nc, 1)"), 6).alias("alpha_ratio6"),
        F.round(F.expr("_ns / greatest(_nt, 1)"), 6).alias("stop_ratio6"),
        F.round(F.expr("_tl / greatest(_nt, 1)"), 6).alias("mean_tok_len6"),
        F.round(
            F.expr(
                "0.4 * (_al / greatest(_nc, 1))"
                " + 0.4 * (_ns / greatest(_nt, 1))"
                " + 0.2 * least(1.0, _nt / 64.0)"
            ),
            6,
        ).alias("quality6"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax of marker-word hits, tie-break lang asc.
    One tokenize into a projected column; the old shape tokenized once
    per language."""
    scores = ", ".join(
        "struct(size(filter(_li_t, t -> array_contains(array("
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
    return docs.select(
        "doc_id", F.expr(_toks(text_col)).alias("_li_t")
    ).select("doc_id", F.expr(f"({pick}).lang").alias("pred_lang"))


def fingerprints(docs: DataFrame, text_col: str = "text", k: int = 8, n: int = 3) -> DataFrame:
    """(doc_id, fp): document fingerprint = bottom-k md5 hashes of token
    n-gram shingles joined with '|' (a bottom-k sketch — same family as
    winnowing; portable to the DuckDB oracle). Tokens and shingles are
    staged projections so the lambdas index cheap array attributes (the
    old shape re-tokenized per shingle through the slice() reference)."""
    sh = f"""
        CASE WHEN size(_fp_t) < {n} THEN array(array_join(_fp_t, ' '))
        ELSE array_distinct(transform(sequence(0, size(_fp_t) - {n}),
                                      i -> concat_ws(' ', slice(_fp_t, i + 1, {n}))))
        END
    """
    return (
        docs.select("doc_id", F.expr(_toks(text_col)).alias("_fp_t"))
        .select("doc_id", F.expr(sh).alias("_fp_sh"))
        .select(
            "doc_id",
            F.expr(
                f"array_join(slice(array_sort(transform(_fp_sh, s -> md5(s))), 1, {k}), '|')"
            ).alias("fp"),
        )
    )


def _runstat_top(grams, n: int):
    """max over distinct grams of count·charlen via ONE pass over the
    sorted gram array (run-length walk — O(G log G) per doc, no per-gram
    refilter). charlen(g) = length(g) − (n−1) separators."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def close(a):
        return F.greatest(
            a.best,
            a.run * F.greatest(F.length(a.prev).cast("long") - (n - 1), F.lit(0).cast("long")),
        )

    def merge(a, g):
        return F.when(
            g == a.prev,
            F.struct(g.alias("prev"), (a.run + 1).alias("run"), a.best.alias("best")),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                close(a).alias("best"),
            )
        )

    return F.aggregate(F.array_sort(grams), init, merge, close)


def _runstat_dup(grams, n: int):
    """Σ over distinct grams with count>1 of (count−1)·charlen — same
    one-pass sorted-run walk as :func:`_runstat_top`."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("acc"),
    )

    def close(a):
        return a.acc + F.greatest(a.run - 1, F.lit(0).cast("long")) * F.greatest(
            F.length(a.prev).cast("long") - (n - 1), F.lit(0).cast("long")
        )

    def merge(a, g):
        return F.when(
            g == a.prev,
            F.struct(g.alias("prev"), (a.run + 1).alias("run"), a.acc.alias("acc")),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                close(a).alias("acc"),
            )
        )

    return F.aggregate(F.array_sort(grams), init, merge, close)


def _grams(toks, n: int):
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gopher_fast_mapper(
    text_col: str, top_ns: tuple[int, ...], dup_ns: tuple[int, ...]
):
    """mapInPandas body for gopher_repetition(impl="fast"): token hashes
    (blake2b, batch-cached) + rolling polynomial gram hashes + one
    np.unique per (doc, n) replace the expression chain's per-gram string
    building and array_sort (measured: 180.7 s → see BENCH — the same
    cost class as the winnowing md5 spec). Counts and char lengths are
    the same integers the expression spec computes (gram identity by
    64-bit content hash — collision-free in practice), so the fractions
    are bit-identical; rounding is half-away-from-zero, Spark's round()."""
    import hashlib
    import math
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(TOK)
    B = np.uint64(1099511628211)

    def r6(num: int, den: int) -> float:
        x = num / max(den, 1)
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    def mapper(batches):
        cache: dict[str, np.uint64] = {}

        def th(t: str) -> np.uint64:
            h = cache.get(t)
            if h is None:
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "big",
                    )
                )
                cache[t] = h
            return h

        for pdf in batches:
            rows = []
            with np.errstate(over="ignore"):
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                    t = text or ""
                    rec = [int(doc_id)]
                    for sep in ("\n", "\n\n"):
                        segs = [s for s in t.split(sep) if s]
                        dst = set(segs)
                        c_all = sum(len(s) for s in segs)
                        c_dst = sum(len(s) for s in dst)
                        rec += [
                            len(segs),
                            r6(len(segs) - len(dst), len(segs)),
                            r6(c_all - c_dst, c_all),
                        ]
                    toks = tok_re.findall(t.lower())
                    lens = np.array([len(x) for x in toks], dtype=np.int64)
                    tokchars = int(lens.sum())
                    hv = np.array([th(x) for x in toks], dtype=np.uint64)
                    csum = np.concatenate(([0], np.cumsum(lens)))

                    def gram_stats(n: int):
                        n_g = len(hv) - n + 1
                        if n_g <= 0:
                            return np.zeros(0, np.int64), np.zeros(0, np.int64)
                        g = np.zeros(n_g, dtype=np.uint64)
                        for j in range(n):
                            g = g * B + hv[j : j + n_g]
                        # gram at i covers tokens i..i+n−1: Σlens = csum[i+n]−csum[i]
                        clen = csum[n:] - csum[:-n]
                        _, first, counts = np.unique(
                            g, return_index=True, return_counts=True
                        )
                        return counts.astype(np.int64), clen[first]

                    for n in top_ns:
                        counts, clens = gram_stats(n)
                        best = int((counts * clens).max()) if len(counts) else 0
                        rec.append(r6(best, tokchars))
                    for n in dup_ns:
                        counts, clens = gram_stats(n)
                        dupm = counts > 1
                        dup = int(((counts[dupm] - 1) * clens[dupm]).sum())
                        rec.append(r6(dup, tokchars))
                    rows.append(rec)
            cols = ["doc_id"]
            for unit in ("line", "para"):
                cols += [
                    f"n_{unit}s", f"dup_{unit}_frac6", f"dup_{unit}_char_frac6",
                ]
            cols += [f"top_{n}gram_char_frac6" for n in top_ns]
            cols += [f"dup_{n}gram_char_frac6" for n in dup_ns]
            yield pd.DataFrame(rows, columns=cols)

    return mapper


def gopher_repetition(
    docs: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    impl: str = "expr",
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, Table A1): per-doc
    repetition signals every published pre-training pipeline screens on.

    - ``dup_line_frac6`` / ``dup_para_frac6``: fraction of non-empty
      lines (split on ``\\n``) / paragraphs (split on ``\\n\\n``) that are
      repeat occurrences ((total − distinct) / total).
    - ``dup_line_char_frac6`` / ``dup_para_char_frac6``: fraction of
      line/paragraph characters inside those repeat occurrences
      (Σ_all len − Σ_distinct len) / Σ_all len.
    - ``top_{n}gram_char_frac6`` (n ∈ top_ns): characters covered by the
      most-repeated token n-gram — max_g count(g)·charlen(g) / Σ token
      chars, charlen = gram length minus separators.
    - ``dup_{n}gram_char_frac6`` (n ∈ dup_ns): characters in duplicate
      n-gram occurrences — Σ_{g: count>1} (count−1)·charlen(g) / Σ token
      chars (occurrence-count spec; overlaps are NOT merged — the
      documented delta vs the paper's char-marking variant, same
      monotonicity, strictly cheaper at scale).

    One map-side pass per doc — no shuffle, embarrassingly parallel at
    100 TB. ``impl="expr"`` (the oracle-portable SPEC, 100% built-in
    expressions; gram counting = a sorted run-length walk, O(G log G))
    measured 180.7 s over 480k code files — the per-gram string building
    × 5 n-values is the winnowing-md5 cost class. ``impl="fast"`` is the
    production path: one mapInPandas pass with blake2b token hashes +
    rolling polynomial gram hashes + np.unique run-lengths (the
    winnow_fast pattern) producing the SAME integers, hence bit-identical
    fractions (tested on synthetic and real corpora) — 22.9 s for the
    same 480k pass (7.9×).
    """
    if impl == "fast":
        schema = ", ".join(
            ["doc_id long"]
            + [
                f"n_{u}s long, dup_{u}_frac6 double, dup_{u}_char_frac6 double"
                for u in ("line", "para")
            ]
            + [f"top_{n}gram_char_frac6 double" for n in top_ns]
            + [f"dup_{n}gram_char_frac6 double" for n in dup_ns]
        )
        return docs.select("doc_id", text_col).mapInPandas(
            _gopher_fast_mapper(text_col, tuple(top_ns), tuple(dup_ns)),
            schema=schema,
        )
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r} (expr | fast)")
    # Stage the split/tokenize arrays as ONE projection (round-6): the
    # old shape inlined them into every output column — and _grams
    # indexes the token array per gram, so the inline form re-ran the
    # regexp tokenize per GRAM × 5 n-values (the dominant share of the
    # measured 180.7 s/480k expr wall).
    txt = F.coalesce(F.col(text_col), F.lit(""))
    staged = docs.select(
        "doc_id",
        F.filter(F.split(txt, "\n"), lambda x: x != F.lit("")).alias("_gl"),
        F.filter(F.split(txt, "\n\n"), lambda x: x != F.lit("")).alias("_gp"),
        F.expr(_toks(text_col)).alias("_gt"),
    )
    lines, paras, toks = F.col("_gl"), F.col("_gp"), F.col("_gt")

    def chars_of(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        )

    def frac6(num, den):
        return F.round(num / F.greatest(den, F.lit(1)), 6)

    tokchars = chars_of(toks)
    cols = [F.col("doc_id")]
    for unit, arr in (("line", lines), ("para", paras)):
        n_all = F.size(arr).cast("long")
        n_dst = F.size(F.array_distinct(arr)).cast("long")
        c_all = chars_of(arr)
        c_dst = chars_of(F.array_distinct(arr))
        cols += [
            n_all.alias(f"n_{unit}s"),
            frac6(n_all - n_dst, n_all).alias(f"dup_{unit}_frac6"),
            frac6(c_all - c_dst, c_all).alias(f"dup_{unit}_char_frac6"),
        ]
    for n in top_ns:
        cols.append(
            frac6(_runstat_top(_grams(toks, n), n), tokchars).alias(
                f"top_{n}gram_char_frac6"
            )
        )
    for n in dup_ns:
        cols.append(
            frac6(_runstat_dup(_grams(toks, n), n), tokchars).alias(
                f"dup_{n}gram_char_frac6"
            )
        )
    return staged.select(*cols)


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


def blocklist_filter(
    docs: DataFrame, blocked: list[str], text_col: str = "text"
) -> DataFrame:
    """C4-style badword/blocklist filter (Raffel et al. 2020 drop any page
    containing a blocklisted word): keep docs whose token set intersects
    ``blocked`` nowhere. 100% JVM — one codegen map pass, the predicate
    pushes to the scan; the blocklist is an inline array literal (client-
    sized by contract; a corpus-scale list would become a broadcast
    anti-join on the exploded tokens instead)."""
    toks = F.expr(
        f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    )
    arr = F.array(*[F.lit(t) for t in sorted(set(blocked))])
    return docs.filter(~F.arrays_overlap(toks, arr))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_quality_fast_mapper(text_col: str):
    """mapInPandas body for gopher_quality(impl="fast"): the whole batch's
    texts are concatenated into ONE codepoint array and every rule becomes
    a handful of full-array numpy ops (word/line boundaries via masked
    cumsums, per-doc sums via bincount) — no per-word Python, no per-word
    JVM regex lambdas (the expression spec's cost, measured 31.5 s/480k;
    see gopher_repetition's fast path for the same measured-then-fixed
    pattern). Counts are the same integers the expression spec computes:

    - words = maximal runs of non-[Java \\s] chars (split('\\\\s+') ∘
      filter ≠ '');
    - '#' per word ≡ '#' per text (split only removes whitespace);
    - regexp_extract_all '(\\.\\.\\.|…)' ≡ Σ floor(dot_run/3) + #'…'
      (non-overlapping left-to-right with a 1-char alternative);
    - bullet: first non-' ' char of a line (Spark ltrim trims 0x20 only);
    - ellipsis: last non-' ' char run, honouring Java default-mode '$'
      which also matches before ONE final line terminator (\\r, \\u0085,
      \\u2028, \\u2029 — '\\n' cannot survive the line split);
    - stopwords: ASCII-only lowering is exact for this stopword set (no
      non-ASCII codepoint lowers INTO 'the'/'be'/…: the only 1-char maps
      into ASCII are U+212A→k / U+017F→ſ, and multi-char expansions like
      İ→i̇ change the length).

    Fractions are rounded half-away-from-zero at 6 dp (Spark round()),
    hence bit-identical rows (parity-tested vs the spec on synthetic edge
    docs and the real corpus)."""
    import numpy as np
    import pandas as pd

    WS = np.array([9, 10, 11, 12, 13, 32], np.int32)  # Java \s default
    TERM = np.array([13, 0x85, 0x2028, 0x2029], np.int32)

    def r6(num, den):
        x = num.astype(np.float64) / np.maximum(den, 1)
        return np.floor(x * 1e6 + 0.5) / 1e6

    def mapper(batches):
        for pdf in batches:
            texts = ["" if t is None else t for t in pdf[text_col]]
            n = len(texts)
            doc_ids = pdf["doc_id"].to_numpy("int64")
            lens = np.array([len(t) for t in texts], np.int64)
            total = int(lens.sum())
            cp = np.frombuffer(
                "".join(texts).encode("utf-32-le"), np.uint32
            ).astype(np.int32)
            doc_off = np.concatenate(([0], np.cumsum(lens)))
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            doc_starts = doc_off[:-1][lens > 0]

            def bc(weights) -> np.ndarray:
                return np.bincount(
                    doc_idx, weights, minlength=n
                ).astype(np.int64)

            def shifted(mask) -> np.ndarray:
                prev = np.empty_like(mask)
                if total:
                    prev[0] = False
                    prev[1:] = mask[:-1]
                    prev[doc_starts] = False  # runs never cross docs
                return prev

            is_ws = np.isin(cp, WS)
            nonws = ~is_ws
            w_start = nonws & ~shifted(nonws)
            ws_pos = np.flatnonzero(w_start)
            n_words_d = bc(w_start)
            sum_len_d = bc(nonws)
            n_hash_d = bc(cp == 35)

            # per-word: id, doc, length, contains-ASCII-letter
            n_words_t = len(ws_pos)
            wid = np.cumsum(w_start) - 1
            word_doc = doc_idx[ws_pos]
            wlen = np.bincount(
                wid[nonws], minlength=n_words_t
            ).astype(np.int64)
            is_alpha = ((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122))
            word_has_alpha = (
                np.bincount(wid[is_alpha], minlength=n_words_t) > 0
            )
            n_alpha_d = np.bincount(
                word_doc, word_has_alpha, minlength=n
            ).astype(np.int64)

            # stopwords: exact per-word equality after ASCII lowering
            cp_l = cp + 32 * (((cp >= 65) & (cp <= 90)).astype(np.int32))
            n_stop_d = np.zeros(n, np.int64)
            for s in GOPHER_STOPWORDS:
                m = len(s)
                sel = wlen == m
                cand, cdoc = ws_pos[sel], word_doc[sel]
                eq = np.ones(len(cand), bool)
                for j, ch in enumerate(s):
                    eq &= cp_l[cand + j] == ord(ch)
                n_stop_d += np.bincount(cdoc[eq], minlength=n) > 0

            # '...' runs (floor(run/3) matches each) + literal '…'
            is_dot = cp == 46
            run_start = is_dot & ~shifted(is_dot)
            rid = np.cumsum(run_start) - 1
            run_len = np.bincount(
                rid[is_dot], minlength=int(run_start.sum())
            ).astype(np.int64)
            run_doc = doc_idx[np.flatnonzero(run_start)]
            n3_d = np.bincount(
                run_doc, run_len // 3, minlength=n
            ).astype(np.int64)
            sym_d = n_hash_d + n3_d + bc(cp == 0x2026)

            # lines: a char's line starts at the doc start or after a '\n'
            is_nl = cp == 10
            n_lines_d = bc(is_nl) + 1
            ls_mask = shifted(is_nl)
            ls_mask[doc_starts] = True
            lid = np.cumsum(ls_mask) - 1
            ls_idx = np.flatnonzero(ls_mask)

            # bullet: first non-space char of the line (the '\n'
            # terminator char counts as content and correctly fails)
            nonspace = cp != 32
            idx1 = np.flatnonzero(nonspace)
            bullet_d = np.zeros(n, np.int64)
            if len(idx1):
                l1 = lid[idx1]
                fm = np.empty(len(idx1), bool)
                fm[0] = True
                fm[1:] = l1[1:] != l1[:-1]
                fpos = idx1[fm]
                fcp = cp[fpos]
                is_b = (fcp == 0x2022) | (fcp == 45) | (fcp == 42)
                bullet_d = np.bincount(
                    doc_idx[fpos], is_b, minlength=n
                ).astype(np.int64)

            # ellipsis-ending: last non-space content char, minus one
            # final Java line terminator
            content = nonspace & ~is_nl
            idx2 = np.flatnonzero(content)
            ell_d = np.zeros(n, np.int64)
            if len(idx2):
                l2 = lid[idx2]
                lm = np.empty(len(idx2), bool)
                lm[-1] = True
                lm[:-1] = l2[1:] != l2[:-1]
                lpos = idx2[lm]
                e = lpos - np.isin(cp[lpos], TERM)
                ls_of = ls_idx[l2[lm]]
                ok = e >= ls_of
                ee = np.where(ok, e, 0)
                is_h = ok & (cp[ee] == 0x2026)
                can3 = ok & (e - 2 >= ls_of)
                p0 = np.where(can3, e, 0)
                is3 = (
                    can3
                    & (cp[p0] == 46)
                    & (cp[np.maximum(p0 - 1, 0)] == 46)
                    & (cp[np.maximum(p0 - 2, 0)] == 46)
                )
                ell_d = np.bincount(
                    doc_idx[lpos], is_h | is3, minlength=n
                ).astype(np.int64)

            nz = np.maximum(n_words_d, 1)
            mean6 = r6(sum_len_d, nz)
            sym6 = r6(sym_d, nz)
            bullet6 = r6(bullet_d, n_lines_d)
            ell6 = r6(ell_d, n_lines_d)
            alpha6 = r6(n_alpha_d, nz)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "n_words": n_words_d,
                    "mean_word_len6": mean6,
                    "symbol_ratio6": sym6,
                    "bullet_frac6": bullet6,
                    "ellipsis_frac6": ell6,
                    "alpha_frac6": alpha6,
                    "n_stopwords": n_stop_d,
                    "passes": (
                        (n_words_d >= 50)
                        & (n_words_d <= 100_000)
                        & (mean6 >= 3.0)
                        & (mean6 <= 10.0)
                        & (sym6 <= 0.1)
                        & (bullet6 <= 0.9)
                        & (ell6 <= 0.3)
                        & (alpha6 >= 0.8)
                        & (n_stop_d >= 2)
                    ),
                }
            )

    return mapper


def gopher_quality(
    docs: DataFrame, text_col: str = "text", impl: str = "expr"
) -> DataFrame:
    """The NON-repetition Gopher quality rules (Rae et al. 2021 Table A1
    — :func:`gopher_repetition` covers the repetition family): per doc,

    - n_words, mean word length (words = whitespace-split runs),
    - symbol-to-word ratio (# and … / "..." occurrences per word),
    - fraction of LINES starting with a bullet (•/-/*) and ending with
      an ellipsis,
    - fraction of words containing ≥ 1 alphabetic character,
    - count of the 8 Gopher stop words present,

    plus ``passes`` — the paper's bounds ANDed: 50 ≤ words ≤ 100,000,
    3 ≤ mean_word_len ≤ 10, symbol ratio ≤ 0.1, bullet lines ≤ 0.9,
    ellipsis lines ≤ 0.3, alpha-word fraction ≥ 0.8, ≥ 2 distinct stop
    words. One map pass either way — every metric is integer counts with
    a single final division (rounded 6 dp), so the whole frame is
    oracle-exact. ``impl="expr"`` is the oracle-portable SPEC (100%
    built-in expressions; its per-word regex lambdas measured 31.5 s over
    480k code files); ``impl="fast"`` is the production path — one
    batch-vectorized numpy mapInPandas pass producing bit-identical rows
    (the gopher_repetition/winnowing measured-then-fixed pattern)."""
    if impl == "fast":
        return docs.select("doc_id", text_col).mapInPandas(
            _gopher_quality_fast_mapper(text_col),
            schema=(
                "doc_id long, n_words long, mean_word_len6 double, "
                "symbol_ratio6 double, bullet_frac6 double, "
                "ellipsis_frac6 double, alpha_frac6 double, "
                "n_stopwords long, passes boolean"
            ),
        )
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r} (expr | fast)")
    words = (
        f"filter(split(coalesce({text_col}, ''), '\\\\s+'), x -> x != '')"
    )
    lines = f"split(coalesce({text_col}, ''), '\\n')"
    nw = F.expr(f"size({words})")
    sum_len = F.expr(f"aggregate({words}, 0L, (a, x) -> a + length(x))")
    n_sym = F.expr(
        f"aggregate({words}, 0L, (a, x) -> a + length(x) - "
        f"length(replace(x, '#', ''))) + "
        f"size(regexp_extract_all(coalesce({text_col}, ''), "
        f"'(\\\\.\\\\.\\\\.|\\u2026)', 0))"
    )
    n_bullet = F.expr(
        f"size(filter({lines}, x -> ltrim(x) rlike '^[\\u2022\\\\-\\\\*]'))"
    )
    n_ell = F.expr(
        f"size(filter({lines}, x -> rtrim(x) rlike "
        f"'(\\\\.\\\\.\\\\.|\\u2026)$'))"
    )
    n_lines = F.expr(f"size({lines})")
    n_alpha = F.expr(
        f"size(filter({words}, x -> x rlike '[A-Za-z]'))"
    )
    stop_arr = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_stop = F.expr(
        f"size(filter(array({stop_arr}), s -> "
        f"array_contains(transform({words}, x -> lower(x)), s)))"
    )
    d = docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        sum_len.alias("_sl"),
        n_sym.alias("_sym"),
        n_bullet.alias("_nb"),
        n_ell.alias("_ne"),
        n_lines.alias("_nl"),
        n_alpha.alias("_na"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    nz = F.greatest(F.col("n_words"), F.lit(1))
    out = d.select(
        "doc_id",
        "n_words",
        F.round(F.col("_sl").cast("double") / nz, 6).alias("mean_word_len6"),
        F.round(F.col("_sym").cast("double") / nz, 6).alias("symbol_ratio6"),
        F.round(
            F.col("_nb").cast("double") / F.col("_nl"), 6
        ).alias("bullet_frac6"),
        F.round(
            F.col("_ne").cast("double") / F.col("_nl"), 6
        ).alias("ellipsis_frac6"),
        F.round(F.col("_na").cast("double") / nz, 6).alias("alpha_frac6"),
        "n_stopwords",
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len6") >= 3.0)
        & (F.col("mean_word_len6") <= 10.0)
        & (F.col("symbol_ratio6") <= 0.1)
        & (F.col("bullet_frac6") <= 0.9)
        & (F.col("ellipsis_frac6") <= 0.3)
        & (F.col("alpha_frac6") >= 0.8)
        & (F.col("n_stopwords") >= 2),
    )
