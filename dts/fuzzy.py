"""Fuzzy term expansion: trigram candidates + banded edit-distance verify.

This is the graft of the reference's approximate matching (the Levenshtein
kernel src/apm1.c:82-105 and θ-filter `distance <= approx_factor`
src/apm1.c:272-274, O9/O10): instead of sliding a byte window over the
corpus per query, a fuzzy query term resolves to the EXACT index terms
within edit distance k, then scoring proceeds through the index.

Pipeline (all DataFrame ops + one vectorized pandas UDF):
1. candidate generation — character trigrams of vocabulary terms (from the
   persisted term_stats table = the vocabulary) joined to query-term
   trigrams; a candidate survives if shared distinct-trigram count
   ≥ max(1, |distinct_trigrams(q)| - 3k) and |len(t) - len(q)| ≤ k.
   (Distinct-world q-gram bound: one edit destroys ≤ 3 trigram
   OCCURRENCES, hence ≤ 3 distinct trigram TYPES can vanish per edit —
   sound for terms with repeated trigrams, unlike the multiset bound
   len(q)-2-3k which over-filters e.g. 'abababab'.) Trigrams are
   computed with built-in SQL (sequence/transform/substring) — zero Python.
2. verification — banded Wagner–Fischer DP (band 2k+1), the same
   recurrence as the reference kernel, vectorized ACROSS the candidate
   batch in numpy: the i/j loops run over the (short) term lengths while
   every operation is a batch-wide vector op. Matches dts.oracle's
   banded_levenshtein decision (≤ k) exactly.

Shared constants live in FIXTURES.md §5; the oracle implements the same.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

# Trigram set as a SQL expression (distinct; whole term if len < 3).
_TRIGRAM_EXPR = """
CASE WHEN length({c}) < 3 THEN array({c})
     ELSE array_distinct(transform(sequence(1, length({c}) - 2),
                                   i -> substring({c}, i, 3)))
END
"""


def trigram_col(col: str):
    return F.expr(_TRIGRAM_EXPR.format(c=col))


# Above this many distinct query trigrams, the IN-list pushdown on the
# persisted trigram table loses to a plain scan + broadcast join.
MAX_TRI_ISIN = 512


def trigrams_py(t: str) -> set[str]:
    """Driver-side twin of _TRIGRAM_EXPR (whole term when len < 3)."""
    if len(t) < 3:
        return {t}
    return {t[i : i + 3] for i in range(len(t) - 2)}


def banded_lev_batch(
    a_list: np.ndarray, b_list: np.ndarray, k_arr: np.ndarray
) -> np.ndarray:
    """Banded Levenshtein for a batch of (a, b, k) triples.

    Returns distance if ≤ k else k+1 (per pair). Same recurrence/band as
    dts.oracle.banded_levenshtein (itself mirroring the reference kernel
    src/apm1.c:86-105), vectorized across the batch: the DP loops run over
    string positions, every inner op is an n-wide numpy vector op.
    """
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(a) for a in a_list], dtype=np.int64)
    lb = np.array([len(b) for b in b_list], dtype=np.int64)
    maxa, maxb = int(la.max(initial=0)), int(lb.max(initial=0))
    k_arr = np.asarray(k_arr, dtype=np.int64)
    big = k_arr + 1

    A = np.zeros((n, max(maxa, 1)), dtype=np.uint32)
    Bm = np.zeros((n, max(maxb, 1)), dtype=np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b_list):
        if s:
            Bm[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    js = np.arange(maxb + 1)
    prev = np.minimum(np.broadcast_to(js, (n, maxb + 1)), big[:, None]).astype(
        np.int64
    )
    cur = np.empty_like(prev)
    for i in range(1, maxa + 1):
        active = i <= la
        cur[:, 0] = np.where(i <= k_arr, i, big)
        for j in range(1, maxb + 1):
            cost = (A[:, i - 1] != Bm[:, j - 1]).astype(np.int64)
            val = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
            inband = (j >= i - k_arr) & (j <= i + k_arr) & (j <= lb)
            cur[:, j] = np.where(inband, val, big)
        prev = np.where(active[:, None], cur, prev)
        cur = np.empty_like(prev)
    out = prev[np.arange(n), lb]
    return np.minimum(out, big)


@F.pandas_udf(BooleanType())
def banded_lev_le_k_udf(
    qterm: pd.Series, term: pd.Series, k: pd.Series
) -> pd.Series:
    d = banded_lev_batch(
        qterm.to_numpy(), term.to_numpy(), k.to_numpy("int64")
    )
    return pd.Series(d <= k.to_numpy("int64"))


def vocab_trigrams(vocab: DataFrame) -> DataFrame:
    """(term, tri) exploded distinct trigrams of the vocabulary — persisted
    at build time (index_build writes it tri-sorted so query-time trigram
    lookups prune parquet row-groups instead of re-deriving trigrams from
    the whole vocabulary per batch)."""
    return vocab.select("term", F.explode(trigram_col("term")).alias("tri"))


def build_vocab_struct(vocab_terms: list[str]) -> dict:
    """Driver-side expansion structures over a collected vocabulary:
    trigram inverted index + lengths. Built once per vocab (cached by the
    caller); ~50 ms per 50k terms."""
    tri_index: dict[str, list[int]] = {}
    for i, t in enumerate(vocab_terms):
        for tri in trigrams_py(t):
            tri_index.setdefault(tri, []).append(i)
    return {
        "terms": vocab_terms,
        "tri_index": tri_index,
        "lens": np.array([len(t) for t in vocab_terms], dtype=np.int64),
    }


def expand_fuzzy_local(
    pairs: list[tuple[str, int]], vocab: dict
) -> dict[tuple[str, int], list[str]]:
    """Driver-side fuzzy expansion — EXACTLY the engine/oracle semantics
    (distinct-trigram prefilter max(1, |tri(q)|-3k), |len Δ| ≤ k, banded
    verify ≤ k), run in numpy over a collected vocabulary. Used when the
    vocab is driver-sized: it replaces a whole Spark job (trigram join +
    UDF verify) whose fixed scheduling cost otherwise dominates small-index
    query batches. The distributed path remains for huge vocabularies."""
    from collections import Counter

    terms, tri_index, lens = vocab["terms"], vocab["tri_index"], vocab["lens"]
    out: dict[tuple[str, int], list[str]] = {}
    for q, k in pairs:
        qt = trigrams_py(q)
        thresh = max(1, len(qt) - 3 * k)
        shared = Counter()
        for tri in qt:
            shared.update(tri_index.get(tri, ()))
        cand = [
            i
            for i, c in shared.items()
            if c >= thresh and abs(int(lens[i]) - len(q)) <= k
        ]
        if not cand:
            out[(q, k)] = []
            continue
        cand_terms = [terms[i] for i in cand]
        d = banded_lev_batch(
            np.array([q] * len(cand), dtype=object),
            np.array(cand_terms, dtype=object),
            np.full(len(cand), k, dtype=np.int64),
        )
        out[(q, k)] = [t for t, dd in zip(cand_terms, d) if dd <= k]
    return out


def expand_fuzzy_terms(
    fuzzy_qterms: DataFrame,
    vocab: DataFrame,
    vocab_tri: DataFrame | None = None,
    qtris: list[str] | None = None,
) -> DataFrame:
    """(query_id, qterm, fuzzy_k) × vocab(term) → (query_id, term).

    Multiplicity preserved: a qterm occurring twice in a query yields its
    expansions twice (the oracle extends per occurrence). ``vocab`` is the
    term_stats table (term column used). ``vocab_tri`` is the persisted
    (term, tri) table when the index has one: the query's distinct
    trigrams then become an IN-list filter pushed into its tri-sorted
    parquet scan, replacing the full-vocabulary trigram re-derivation.
    """
    # Expand each DISTINCT (qterm, fuzzy_k) once, then join expansions back
    # to the occurrence rows — multiplicity restored by the join, and the
    # trigram/verify work never repeats per occurrence.
    pairs = fuzzy_qterms.select("qterm", "fuzzy_k").distinct()
    qtri = pairs.select(
        "qterm",
        "fuzzy_k",
        F.size(trigram_col("qterm")).alias("n_qtri"),
        F.explode(trigram_col("qterm")).alias("tri"),
    )
    if vocab_tri is not None:
        # qtris (precomputed driver-side by expanded_query_terms) saves the
        # collect; derive with a tiny job otherwise.
        tris = (
            qtris
            if qtris is not None
            else [r["tri"] for r in qtri.select("tri").distinct().collect()]
        )
        if not tris:  # no fuzzy occurrences at all — skip the join plan
            empty_schema = (
                "query_id long, clause int, term string"
                if "clause" in fuzzy_qterms.columns
                else "query_id long, term string"
            )
            return fuzzy_qterms.sparkSession.createDataFrame([], empty_schema)
        if len(tris) <= MAX_TRI_ISIN:
            # Small batch: IN-list pushdown prunes the tri-sorted parquet.
            vtri = vocab_tri.filter(F.col("tri").isin(tris))
        else:
            # Wide batch (measured: a ~1500-literal In costs more in plan
            # compile + per-row eval than it saves): plain scan — the
            # broadcast tri join below does the filtering.
            vtri = vocab_tri
    else:
        vtri = vocab_trigrams(vocab)
    cand = (
        vtri.join(F.broadcast(qtri), "tri")
        .groupBy("qterm", "fuzzy_k", "n_qtri", "term")
        .agg(F.count("*").alias("shared"))
        .filter(
            (F.col("shared") >= F.greatest(F.lit(1), F.col("n_qtri") - 3 * F.col("fuzzy_k")))
            & (F.abs(F.length("term") - F.length("qterm")) <= F.col("fuzzy_k"))
        )
    )
    verified = cand.filter(
        banded_lev_le_k_udf(F.col("qterm"), F.col("term"), F.col("fuzzy_k"))
    ).select("qterm", "fuzzy_k", "term")
    # Preserve the clause column (query token position) when the caller
    # tracks it — conjunctive (AND) scoring needs per-clause presence.
    keep = ["query_id"] + (
        ["clause"] if "clause" in fuzzy_qterms.columns else []
    ) + ["term"]
    return fuzzy_qterms.join(verified, ["qterm", "fuzzy_k"]).select(*keep)


def banded_osa_batch(
    a_list: np.ndarray, b_list: np.ndarray, k_arr: np.ndarray
) -> np.ndarray:
    """Banded OSA (optimal string alignment / restricted Damerau)
    distance for a batch of (a, b, k) triples — Lucene FuzzyQuery's
    DEFAULT metric (``transpositions=true``: an adjacent swap costs ONE
    edit, so "tabel"→"table" is distance 1 where plain Levenshtein says
    2). Returns distance if ≤ k else k+1. Same batch-vectorized shape as
    :func:`banded_lev_batch`, with the extra prev-prev row for the
    transposition term."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(a) for a in a_list], dtype=np.int64)
    lb = np.array([len(b) for b in b_list], dtype=np.int64)
    maxa, maxb = int(la.max(initial=0)), int(lb.max(initial=0))
    k_arr = np.asarray(k_arr, dtype=np.int64)
    big = k_arr + 1

    A = np.zeros((n, max(maxa, 1)), dtype=np.uint32)
    Bm = np.zeros((n, max(maxb, 1)), dtype=np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    for i, s in enumerate(b_list):
        if s:
            Bm[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )

    js = np.arange(maxb + 1)
    prev = np.minimum(
        np.broadcast_to(js, (n, maxb + 1)), big[:, None]
    ).astype(np.int64)
    prev2 = np.full_like(prev, 0)
    for i in range(1, maxa + 1):
        active = i <= la
        cur = np.full((n, maxb + 1), 0, dtype=np.int64)
        cur[:, 0] = np.where(i <= k_arr, i, big)
        for j in range(1, maxb + 1):
            cost = (A[:, i - 1] != Bm[:, j - 1]).astype(np.int64)
            val = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
            if i > 1 and j > 1:
                swap = (A[:, i - 1] == Bm[:, j - 2]) & (
                    A[:, i - 2] == Bm[:, j - 1]
                )
                val = np.where(
                    swap, np.minimum(val, prev2[:, j - 2] + 1), val
                )
            inband = (j >= i - k_arr) & (j <= i + k_arr) & (j <= lb)
            cur[:, j] = np.where(inband, val, big)
        prev2 = np.where(active[:, None], prev, prev2)
        prev = np.where(active[:, None], cur, prev)
    out = prev[np.arange(n), lb]
    return np.minimum(out, big)


def expand_fuzzy_osa(
    pairs: list[tuple[str, int]], vocab: dict
) -> dict[tuple[str, int], list[str]]:
    """Driver-side OSA fuzzy expansion (Lucene transpositions=true). The
    trigram prefilter floor WIDENS to max(1, |tri(q)| − 4k): one OSA
    transposition disturbs up to FOUR trigrams (the windows covering the
    swapped pair) where a plain edit disturbs three — using the 3k floor
    here would drop true matches. Length delta stays ≤ k (a transposition
    preserves length). Verification = :func:`banded_osa_batch`.

    No portable SQL oracle exists (DuckDB's levenshtein is plain), so
    this surface is pytest-verified against an exhaustive python OSA
    replay — documented delta from the probe-everything norm."""
    from collections import Counter

    terms, tri_index, lens = vocab["terms"], vocab["tri_index"], vocab["lens"]
    out: dict[tuple[str, int], list[str]] = {}
    for q, k in pairs:
        qt = trigrams_py(q)
        thresh = len(qt) - 4 * k
        if thresh >= 1:
            shared = Counter()
            for tri in qt:
                shared.update(tri_index.get(tri, ()))
            cand = [
                i
                for i, c in shared.items()
                if c >= thresh and abs(int(lens[i]) - len(q)) <= k
            ]
        else:
            # Short terms: a transposition can erase EVERY shared trigram
            # ("fsat"→"fast" shares none), so when the q-gram bound gives
            # no filtering power the candidates degrade to the
            # length-banded vocabulary — correct, and cheap at the
            # driver-vocab sizes this path serves.
            cand = [
                i
                for i in range(len(terms))
                if abs(int(lens[i]) - len(q)) <= k
            ]
        if not cand:
            out[(q, k)] = []
            continue
        cand_terms = [terms[i] for i in cand]
        d = banded_osa_batch(
            np.array([q] * len(cand), dtype=object),
            np.array(cand_terms, dtype=object),
            np.full(len(cand), k, dtype=np.int64),
        )
        out[(q, k)] = [t for t, dd in zip(cand_terms, d) if dd <= k]
    return out
