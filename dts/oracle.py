"""Single-process reference engine — the spec the Spark engine must match.

Plays exactly the role the sequential `apm1` binary plays in the reference's
randomized differential tests (reference src/apm1.c, driven by
src/test_generation.py:147-178, which demands EXACT equality): a slow,
obviously-correct oracle. ~200 LoC, numpy only, no Spark.

Shared constants (FIXTURES.md §5) — the engine imports nothing from here,
but both sides implement these verbatim:
- tokenizer: dts.tokenizer.tokenize_text (single source of truth, imported)
- BM25: k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)), float64
- per-doc score = sum of per-term contributions in ASCENDING TERM ORDER
  (fixed summation order ⇒ bit-identical float64 across implementations)
- tie-break: (score DESC, doc_id ASC)
- fuzzy expansion: char trigrams of the raw term; candidate if shared
  distinct-trigram count ≥ max(1, |distinct_trigrams(q)| - 3*k) (sound
  distinct-world q-gram bound — one edit kills ≤ 3 trigram occurrences,
  so ≤ 3 distinct types can vanish per edit); verified with banded
  Levenshtein ≤ k (band width 2k+1), replicating the reference kernel's
  DP semantics (src/apm1.c:82-105) restricted to a band
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from dts.tokenizer import tokenize_text

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def banded_levenshtein(a: str, b: str, k: int) -> int:
    """Edit distance if ≤ k, else k+1. Band width 2k+1 around the diagonal.

    Same Wagner–Fischer single-column recurrence as the reference kernel
    (src/apm1.c:86-105), with the band restriction: cells with |i-j| > k
    are treated as > k.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    big = k + 1
    prev = np.minimum(np.arange(lb + 1), big)
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur[:] = big
        cur[0] = i if i <= k else big
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return int(min(prev[lb], big))


def trigrams(t: str) -> set[str]:
    if len(t) < 3:
        return {t}
    return {t[i : i + 3] for i in range(len(t) - 2)}


class OracleIndex:
    """In-memory index over a list of (doc_id, content) pairs."""

    def __init__(self, docs: list[tuple[int, str]]):
        self.doc_ids = np.array([d for d, _ in docs], dtype=np.int64)
        self.tf: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, content in docs:
            toks = tokenize_text(content)
            self.doc_len[doc_id] = len(toks)
            for t, c in Counter(toks).items():
                self.tf.setdefault(t, {})[doc_id] = c
        self.n_docs = len(docs)
        lens = np.array(list(self.doc_len.values()), dtype=np.float64)
        self.avgdl = float(lens.mean()) if len(lens) else 0.0
        self.vocab = sorted(self.tf)
        self._tri: dict[str, set[str]] = {t: trigrams(t) for t in self.vocab}

    def expand_term(self, q: str, k: int) -> list[str]:
        """Fuzzy expansion: trigram candidates + banded verify. k=0 ⇒ exact."""
        if k == 0:
            return [q] if q in self.tf else []
        qt = trigrams(q)
        thresh = max(1, len(qt) - 3 * k)
        out = []
        for t in self.vocab:
            if abs(len(t) - len(q)) > k:
                continue
            if len(qt & self._tri[t]) < thresh:
                continue
            if banded_levenshtein(q, t, k) <= k:
                out.append(t)
        return out

    def match_counts(self, q: str, k: int) -> dict[int, int]:
        """Reference-faithful counting query (token granularity): per doc,
        the number of token POSITIONS whose token is within distance k of q
        — overlap-counting analogue of src/apm1.c:252-278 (O8-O13)."""
        counts: dict[int, int] = {}
        for t in self.expand_term(q, k):
            for doc_id, tf in self.tf[t].items():
                counts[doc_id] = counts.get(doc_id, 0) + tf
        return counts

    def score_query_and(self, text: str, fuzzy_k: int = 0, topk: int = 10):
        """Conjunctive (Lucene default-AND) spec: a doc is eligible iff
        every query CLAUSE (token position) is satisfied by ≥1 of its
        expansions; scores are the unchanged disjunctive sums."""
        clause_docs = []
        for qt in tokenize_text(text):
            docs_c: set[int] = set()
            for t in self.expand_term(qt, fuzzy_k):
                docs_c |= set(self.tf[t])
            clause_docs.append(docs_c)
        eligible = (
            set.intersection(*clause_docs) if clause_docs else set()
        )
        full = self.score_query(text, fuzzy_k, topk=10**9)
        kept = [
            (doc_id, s) for _, doc_id, s in full if doc_id in eligible
        ][:topk]
        return [(r + 1, d, s) for r, (d, s) in enumerate(kept)]

    def wildcard_expand(self, pattern: str) -> list[str]:
        """Vocabulary terms matching a ``*``-wildcard pattern (the
        dictionary-range expansion of dts.wildcard, spec form)."""
        import re as _re

        rx = _re.compile(
            "^" + ".*".join(_re.escape(p) for p in pattern.split("*")) + "$"
        )
        return [t for t in self.vocab if rx.match(t)]

    def score_terms(self, terms: list[str], topk: int = 10):
        """BM25 top-k for an explicit term multiset (the multi-term rewrite
        spec: each list element contributes its idf·impact once; callers
        pass a distinct set for wildcard semantics). Same summation order
        and ranking contract as score_query."""
        scores: dict[int, float] = {}
        for t in sorted(terms):
            if t not in self.tf:
                continue
            w = idf(self.n_docs, len(self.tf[t]))
            for doc_id in sorted(self.tf[t]):
                tf = self.tf[t][doc_id]
                dl = self.doc_len[doc_id]
                impact = (
                    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + w * impact
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:topk]
        return [(r + 1, doc_id, s) for r, (doc_id, s) in enumerate(ranked)]

    def score_query(self, text: str, fuzzy_k: int = 0, topk: int = 10):
        """BM25 top-k: returns list of (rank, doc_id, score)."""
        qterms = tokenize_text(text)
        expanded: list[str] = []
        for qt in qterms:
            expanded.extend(self.expand_term(qt, fuzzy_k))
        expanded.sort()  # ascending-term summation order (rank identity)
        scores: dict[int, float] = {}
        for t in expanded:
            w = idf(self.n_docs, len(self.tf[t]))
            for doc_id in sorted(self.tf[t]):
                tf = self.tf[t][doc_id]
                dl = self.doc_len[doc_id]
                impact = (
                    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + w * impact
        # Ranking key (round(score,9) DESC, doc_id ASC) — same contract as
        # the engine (dts.score.ROUND_RANK): rounding collapses last-ulp
        # summation noise so ranks are stable across implementations.
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:topk]
        return [(r + 1, doc_id, s) for r, (doc_id, s) in enumerate(ranked)]


def byte_match_count(text: str, pattern: str, k: int) -> int:
    """Reference-faithful per-document byte counting (src/apm1.c:252-278):
    for every start position j the comparison length is
    size = min(m, n - j) (src/apm1.c:263-268) and BOTH strings truncate to
    it — the kernel runs both DP loops to len = size (src/apm1.c:82-105) —
    so count positions with levenshtein(pattern[:size], text[j:j+size]) <= k
    (the θ-filter, src/apm1.c:272-274). Overlapping matches all count."""
    n, m = len(text), len(pattern)
    return sum(
        1
        for j in range(n)
        if banded_levenshtein(
            pattern[: min(m, n - j)], text[j : j + m], k
        ) <= k
    )


def byte_match_count_bytes(text: str, pattern: str, k: int) -> int:
    """The BYTE-exact reference semantic (src/apm1.c:252 sweeps raw
    bytes): identical recurrence to ``byte_match_count`` but over the
    UTF-8 byte sequences — on non-ASCII content window sizes and
    distances differ from the codepoint variant. Spec for
    dts.bytematch.byte_match_counts_binary."""
    t, p = text.encode("utf-8"), pattern.encode("utf-8")
    n, m = len(t), len(p)
    return sum(
        1
        for j in range(n)
        if banded_levenshtein(p[: min(m, n - j)], t[j : j + m], k) <= k
    )


def phrase_bm25_score(
    n_docs: int, avgdl: float, df: int, tf: int, dl: int
) -> float:
    """Lucene PhraseQuery clause score — the spec for
    dts.phrase.phrase_bm25_scores and search(phrase_mode='scored'): the
    phrase is ONE clause whose tf is the per-doc phrase frequency
    (phrase_count) and whose df is the number of docs containing the
    phrase; idf and impact are the exact term-BM25 formulas."""
    w = idf(n_docs, df)
    return w * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def phrase_count(text: str, phrase_terms: list[str]) -> int:
    """Occurrences of the token phrase (consecutive tokens; overlaps count)
    — the position-level spec for dts.phrase (analogue of the reference's
    per-position match enumeration, src/apm1.c:252-268)."""
    toks = tokenize_text(text)
    m = len(phrase_terms)
    if m == 0 or len(toks) < m:
        return 0
    return sum(
        1 for j in range(len(toks) - m + 1) if toks[j : j + m] == phrase_terms
    )


def sloppy_phrase_count(text: str, phrase_terms: list[str], slop: int) -> int:
    """Distinct chain starts p = q_0 < … < q_{m-1} with q_i a position of
    term i and every gap q_i − q_{i−1} in [1, slop] — the spec for
    dts.phrase sloppy phrases (``"a b"~k``). slop=1 equals phrase_count.
    Ordered per-gap semantics; the delta vs Lucene's edit-distance
    SloppyPhraseQuery is documented on phrase_match_counts."""
    toks = tokenize_text(text)
    m = len(phrase_terms)
    if m == 0 or len(toks) < m:
        return 0
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(phrase_terms)}
    live = set(pos[phrase_terms[-1]])
    for t in reversed(phrase_terms[:-1]):
        live = {p for p in pos[t] if any(p < q <= p + slop for q in live)}
        if not live:
            return 0
    return len(live)


def proximity_count(text: str, term_a: str, term_b: str, slop: int) -> int:
    """Positions p of term_a with a term_b at q, 0 < q - p <= slop (the
    ordered-window proximity spec for dts.phrase.proximity_match_counts;
    slop=1 == exact bigram phrase)."""
    toks = tokenize_text(text)
    pb = [j for j, t in enumerate(toks) if t == term_b]
    return sum(
        1
        for p, t in enumerate(toks)
        if t == term_a and any(p < q <= p + slop for q in pb)
    )
