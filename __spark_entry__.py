"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k on sf0.001. ``queries()`` /
``oracle_sql()`` register SQL-expressible probes over the driver's
``documents`` table, one per operator family from SURVEY.md §2 (tokenize /
tf / df / doc-stats O18+O11-O13, BM25 scoring + top-k O19-O21, fuzzy
Levenshtein expansion + counting O8-O10).

Probe tokenizer: the probes use a plain ``[a-z0-9]+`` regex over lowercased
text so the exact same tokenization is expressible in DuckDB SQL; the
engine's code-aware tokenizer (dts.tokenizer) is exercised by pytest against
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
# Byte-granularity patterns (reference-faithful sliding-window counting):
# includes a cross-token pattern with a space — byte windows don't care
# about token boundaries, exactly like the reference's flat byte array.
BYTE_PATTERNS = [
    (0, "fastt", 1),
    (1, "tabel scan", 2),
    (2, "qurey", 1),
    (3, "merge", 0),
]
# Token phrases for the positional-index probe (unigram = tf identity,
# bigrams, plus a trigram that may legitimately miss).
PHRASE_QUERIES = [
    (0, "fast join"),
    (1, "table scan"),
    (2, "customer order"),
    (3, "data"),
    (4, "merge group row"),
]
# Ordered-window proximity pairs (slop=3), incl. a self-pair and a miss.
PROX_PAIRS = [
    (0, "fast", "join"),
    (1, "table", "scan"),
    (2, "data", "data"),
    (3, "query", "zzzmiss"),
]
PROX_SLOP = 3
# Wildcard patterns (* = any run of chars): pure prefix, leading star,
# inner star, literal, multi-star, and a guaranteed miss (count 0).
WILDCARD_PATTERNS = [
    (0, "fa*"),
    (1, "*an"),
    (2, "jo*n"),
    (3, "table"),
    (4, "qu*er*"),
    (5, "zzqq*"),
]
# Boolean MUST / MUST_NOT queries (Lucene-style conjunctive matching
# resolved purely from the compressed postings): an empty must_not, a
# 3-term conjunction, and a negation that actually prunes.
BOOL_QUERIES = [
    (0, "fast join", "slow"),
    (1, "table scan", ""),
    (2, "customer order", "merge"),
    (3, "data query row", ""),
]
# Round-4 BooleanQuery completion: (bq_id, must, should, must_not, msm);
# msm NULL ⇒ Lucene default (0 with MUST, 1 without).
BOOL_SHOULD_QUERIES = [
    (0, "fast", "join scan", "", None),        # must + optional should
    (1, "table", "scan merge query", "", 2),   # must + msm=2
    (2, "", "customer order", "", None),       # should-only → msm=1
    (3, "", "data query row", "", 2),          # should-only msm=2
    (4, "", "fast slow", "merge", 1),          # should + must_not
]

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
    """Flagship: the full engine on sf0.001 — build the compressed inverted
    index, then BM25 top-10 for the probe query set plus two fuzzy queries
    (banded-edit-distance expansion), TAAT over the persisted index."""
    import tempfile

    from dts.index_build import build_index
    from dts.io import driver_documents_as_source
    from dts.score_index import bm25_topk_indexed

    sf_dir = "/root/testdata/sf0.001"
    docs = driver_documents_as_source(spark, sf_dir)
    idx_dir = tempfile.mkdtemp(prefix="dts_entry_idx_")
    build_index(spark, docs, idx_dir, bucket_size=256)
    q = [(i, t, 0) for i, t in PROBE_QUERIES]
    q += [(100, "tabel scann", 2), (101, "qurey fastt", 1)]
    queries = spark.createDataFrame(q, "query_id long, text string, fuzzy_k int")
    return bm25_topk_indexed(spark, idx_dir, queries, k=10).select(
        "query_id", "doc_id", F.round("score", 6).alias("score6"), "rank"
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


def _q_byte_match_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core semantic (src/apm1.c:252-278): per
    (pattern, doc), count start positions j where, with
    size = min(m, n - j) (src/apm1.c:263-268), the PATTERN PREFIX
    pattern[:size] is within levenshtein distance k of the window
    text[j : j+size] — the kernel runs both DP loops to len = size
    (src/apm1.c:82-105), so BOTH strings truncate at the document tail."""
    from dts.bytematch import byte_match_counts

    pat = spark.createDataFrame(
        BYTE_PATTERNS, "pat_id long, pattern string, k int"
    )
    return byte_match_counts(
        _docs(spark, sf_dir).select("doc_id", "text"), pat
    )


def _q_byte_match_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4: the BYTE-exact window variant (src/apm1.c:252 sweeps raw
    bytes) — UTF-8 bytes re-viewed as ISO-8859-1 so the same JVM
    length/substring/levenshtein plan operates at byte granularity. The
    DuckDB oracle rebuilds the identical byte-view string from
    hex(encode(text)), so BOTH engines compute byte-level distances (the
    non-ASCII divergence itself is pinned in pytest — driver corpora are
    ASCII, where byte and codepoint counts provably coincide)."""
    from dts.bytematch import byte_match_counts_binary

    pat = spark.createDataFrame(
        BYTE_PATTERNS, "pat_id long, pattern string, k int"
    )
    return byte_match_counts_binary(
        _docs(spark, sf_dir).select("doc_id", "text"), pat
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


# --------------------------------------------------------------------------
# indexed-engine probes (documents text is pure [a-z0-9 ], so the engine's
# code tokenizer and the SQL oracle tokenizer coincide on this table)
# --------------------------------------------------------------------------


def _q_bm25_topk_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL engine (persisted compressed index + TAAT scorer) against
    the same SQL oracle as bm25_topk: build index, score all docs, re-rank
    on round-6 scores."""
    import tempfile

    from pyspark.sql import Window as W

    from dts.index_build import build_index
    from dts.io import driver_documents_as_source
    from dts.score_index import bm25_topk_indexed

    docs = driver_documents_as_source(spark, sf_dir)
    idx_dir = tempfile.mkdtemp(prefix="dts_probe_idx_")
    build_index(spark, docs, idx_dir, bucket_size=256)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES], "query_id long, text string, fuzzy_k int"
    )
    full = bm25_topk_indexed(spark, idx_dir, q, k=10**6)
    w = W.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        full.withColumn("r6", F.row_number().over(w))
        .filter(F.col("r6") <= 10)
        .select("query_id", "doc_id", F.col("r6").alias("rank"))
    )


def _q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 deep pagination (Lucene searchAfter): page 1's rank-10
    (score, doc_id) becomes the per-query cursor; page 2 collects only
    docs STRICTLY after it in rank order with a k-sized heap (the mask
    applies before local top-k truncation — exact under any bucket
    partition). Oracle: rows 11..20 of the full BM25 ordering."""
    from dts.score_index import bm25_topk_indexed

    idx_dir = _pos_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    page1 = bm25_topk_indexed(spark, idx_dir, q, k=10).collect()
    cursor = {
        int(r["query_id"]): (float(r["score"]), int(r["doc_id"]))
        for r in page1
        if int(r["rank"]) == 10
    }
    page2 = bm25_topk_indexed(spark, idx_dir, q, k=10, search_after=cursor)
    return _rerank6_top10(page2)


_POS_IDX_CACHE: dict[str, str] = {}


def _pos_index(spark: SparkSession, sf_dir: str) -> str:
    """Positional index over the driver docs, built once per process and
    shared by the phrase + proximity probes."""
    if sf_dir not in _POS_IDX_CACHE:
        import tempfile

        from dts.index_build import build_index
        from dts.io import driver_documents_as_source

        idx_dir = tempfile.mkdtemp(prefix="dts_phrase_idx_")
        build_index(
            spark,
            driver_documents_as_source(spark, sf_dir),
            idx_dir,
            bucket_size=256,
            positions=True,
            store_term_vectors=True,
        )
        _POS_IDX_CACHE[sf_dir] = idx_dir
    return _POS_IDX_CACHE[sf_dir]


_DV_IDX_CACHE: dict[str, str] = {}


def _dv_index(spark: SparkSession, sf_dir: str) -> str:
    """Index with the doc_meta stored-fields sidecar (lang, source,
    n_chars) + positions — shared by the doc-values probes (range /
    sort / collapse)."""
    if sf_dir not in _DV_IDX_CACHE:
        import tempfile

        from dts.index_build import build_index
        from dts.io import driver_documents_as_source

        docs = driver_documents_as_source(spark, sf_dir).join(
            _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
            "doc_id",
        )
        idx_dir = tempfile.mkdtemp(prefix="dts_dv_idx_")
        build_index(
            spark, docs, idx_dir, bucket_size=256, positions=True,
            store_fields=["lang", "source", "n_chars"],
        )
        _DV_IDX_CACHE[sf_dir] = idx_dir
    return _DV_IDX_CACHE[sf_dir]


# Range-query probe rows: (query_id, scoring terms, range element in the
# grammar, equivalent SQL predicate over the documents table). Covers
# inclusive/exclusive/open endpoints, a negated range (NULL-field docs
# stay INCLUDED under negation — Lucene semantics: a doc missing the
# field never matches the range), a string-typed range, and an unranged
# query in the same fused batch (the filter_qids gate).
RANGE_QUERIES = [
    (0, "fast join", "n_chars:[100 TO 300]",
     "n_chars >= 100 AND n_chars <= 300"),
    (1, "table scan", "n_chars:{150 TO *]", "n_chars > 150"),
    (2, "customer order", "-n_chars:[200 TO 400]",
     "n_chars IS NULL OR NOT (n_chars >= 200 AND n_chars <= 400)"),
    (3, "data query", "lang:[en TO fr]", "lang >= 'en' AND lang <= 'fr'"),
    (4, "fast join", "", "TRUE"),
]
SORT_FIELD = "n_chars"
COLLAPSE_FIELD = "source"


def _q_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range queries over the stored-fields sidecar (dts.docvalues —
    Lucene Term/NumericRangeQuery on doc values) fused into the parser's
    one-job batch: each ranged query's allow-list is one pushed-down
    sidecar scan riding the per-query (query_id, bucket) filter context;
    scores keep full-corpus stats (filter context semantics)."""
    from dts.parser import search_batch

    qs = [f"{terms} {rng}".strip() for _, terms, rng, _ in RANGE_QUERIES]
    return _rerank6_top10(
        search_batch(spark, _dv_index(spark, sf_dir), qs, k=10**6)
    )


TERMS_SET_QUERIES = [(0, "fast join table scan"), (1, "data query row merge")]
TERMS_SET_MSM = "1 + n_chars % 3"


def _q_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene CoveringQuery / ES terms_set (dts.boolquery.
    terms_set_match): docs where the count of DISTINCT matching query
    terms reaches a PER-DOC minimum read from the doc-values sidecar
    (1 + n_chars % 3 here — the minimum_should_match_field contract)."""
    from dts.boolquery import terms_set_match

    q = spark.createDataFrame(TERMS_SET_QUERIES, "tq_id long, terms string")
    return terms_set_match(
        spark, _dv_index(spark, sf_dir), q, "n_chars", msm_expr=TERMS_SET_MSM
    )


def _q_sorted_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene index sorting + early termination (dts.docvalues.
    sort_index_meta / sorted_topk_indexed): the doc-meta sidecar is
    range-partitioned by n_chars into value-disjoint bins; a sorted top-k
    opens only the minimal bin prefix (partition pruning — the O(k)-IO
    path Lucene gets from setIndexSort). Both directions probed; oracle
    is the plain ORDER BY LIMIT."""
    from dts.docvalues import sort_index_meta, sorted_topk_indexed

    d = _dv_index(spark, sf_dir)
    import os

    if not os.path.isdir(f"{d}/sorted_meta_n_chars"):
        sort_index_meta(spark, d, "n_chars", n_bins=8)
    out = None
    for asc in (True, False):
        part = sorted_topk_indexed(
            spark, d, "n_chars", k=15, ascending=asc
        ).select(
            F.lit("asc" if asc else "desc").alias("direction"),
            "doc_id", "n_chars", "rank",
        )
        out = part if out is None else out.unionByName(part)
    return out


def _q_sort_by_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene Sort(SortField): boolean matches ordered by a stored field
    value instead of relevance (dts.docvalues.sort_topk over the doc_meta
    sidecar); ties break on doc_id ascending."""
    from dts.boolquery import boolean_match_docs
    from dts.docvalues import sort_topk

    bq = spark.createDataFrame(
        BOOL_QUERIES, "bq_id long, must string, must_not string"
    )
    matches = boolean_match_docs(spark, _dv_index(spark, sf_dir), bq)
    return sort_topk(
        spark, _dv_index(spark, sf_dir), matches, SORT_FIELD, k=10,
        ascending=True, key="bq_id",
    )


def _q_collapse_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene field collapsing (grouping): best-scoring doc per distinct
    ``source`` value, survivors re-ranked (dts.docvalues.collapse_topk —
    partial+final hash agg over a comparable struct, so the shuffle
    carries group cardinality, not candidate cardinality). Scores are
    pre-rounded to 6 so best-of-group decisions are cross-engine stable
    (the probe float policy)."""
    from dts.docvalues import collapse_topk_indexed
    from dts.score_index import bm25_topk_indexed

    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    full = bm25_topk_indexed(
        spark, _dv_index(spark, sf_dir), q, k=2**62
    ).withColumn("score", F.round("score", 6))
    return collapse_topk_indexed(
        spark, _dv_index(spark, sf_dir), full, COLLAPSE_FIELD, k=10
    ).select("query_id", COLLAPSE_FIELD, "doc_id", "rank")


# Boosted-query probe rows: (query_id, [(term, boost, required)]) — the
# engine string and the oracle VALUES both derive from this table.
# Covers a boosted bare term, the unboosted control, a boosted MUST with
# a down-weighted sibling, and a fractional boost.
BOOST_ELEMS = [
    (0, [("fast", 2.0, 0), ("join", 1.0, 0)]),
    (1, [("fast", 1.0, 0), ("join", 1.0, 0)]),
    (2, [("table", 3.0, 1), ("scan", 1.0, 0), ("merge", 0.5, 0)]),
    (3, [("data", 2.5, 0), ("query", 1.0, 0)]),
]


def _boost_qstr(elems) -> str:
    return " ".join(
        f"{'+' if req else ''}{t}{('^' + format(b, 'g')) if b != 1.0 else ''}"
        for t, b, req in elems
    )


def _q_search_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``^`` boosts through the query grammar: each element's
    contribution is boost · idf · impact (dts.parser — the boost rides
    the clause rows into the one scoring job; required atoms keep their
    MUST semantics). Oracle: the BM25 CTE with a boost factor per
    qterm row and a required-term eligibility check."""
    from dts.parser import search_batch

    qs = [_boost_qstr(elems) for _, elems in BOOST_ELEMS]
    return _rerank6_top10(
        search_batch(spark, _pos_index(spark, sf_dir), qs, k=10**6)
    )


def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable similarity: Lucene ClassicSimilarity (TFIDFSimilarity —
    sqrt(tf) · idf² · 1/sqrt(dl), idf = 1 + ln(N/(df+1)), exact dl) over
    the same index that serves BM25: the index stores tf/dl, so one
    build serves both similarities; only the kernel's weight/impact
    formulas switch (dts.score.classic_weight / classic_impact)."""
    from dts.score_index import bm25_topk_indexed

    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(
        bm25_topk_indexed(
            spark, _pos_index(spark, sf_dir), q, k=10**6,
            similarity="classic",
        )
    )


def _q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional index + phrase intersection (dts.phrase): per (phrase,
    doc), occurrences of the phrase as consecutive tokens — the indexed
    analogue of the reference's per-position match enumeration
    (src/apm1.c:252-268). Oracle replays it with a token-array scan."""
    from dts.phrase import phrase_match_counts

    ph = spark.createDataFrame(PHRASE_QUERIES, "phrase_id long, text string")
    return phrase_match_counts(spark, _pos_index(spark, sf_dir), ph)


# Sloppy-phrase probe rows (phrase_id, text, slop): ordered chain with
# every adjacent gap in [1, slop]; slop=1 = exact phrase (covered by
# phrase_match) — here 2-term and 3-term chains at slop 2/3, plus a
# repeated-term pair.
SLOP_PHRASES = [
    (0, "fast join", 2),
    (1, "table scan", 3),
    (2, "merge group row", 2),
    (3, "data data", 2),
]


def _q_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrases (dts.phrase — ``"a b"~k`` in the query grammar):
    per doc, the number of chain STARTS p = q_0 < … < q_{m-1} with
    q_i ∈ positions(t_i) and every gap in [1, slop]. Ordered per-gap
    semantics (the proximity operator generalized to m terms) — the
    documented delta vs Lucene's edit-distance SloppyPhraseQuery. Oracle
    replays the chain with nested list_filter over the token array."""
    from dts.phrase import phrase_match_counts

    ph = spark.createDataFrame(
        SLOP_PHRASES, "phrase_id long, text string, slop int"
    )
    return phrase_match_counts(spark, _pos_index(spark, sf_dir), ph)


def _q_proximity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-window proximity over the positional index: positions p of
    term_a followed by term_b within PROX_SLOP tokens (slop=1 == exact
    bigram phrase). Oracle: nested list_filter over the token array."""
    from dts.phrase import proximity_match_counts

    pr = spark.createDataFrame(
        PROX_PAIRS, "pair_id long, term_a string, term_b string"
    )
    return proximity_match_counts(
        spark, _pos_index(spark, sf_dir), pr, slop=PROX_SLOP
    )


SPAN_FIRST_QS = [(0, "join", 3), (1, "hash", 1), (2, "scan", 10)]
SPAN_NEAR2_QS = [(0, "table", "scan", 2), (1, "fast", "join", 0)]
SPAN_NEAR3_Q = (2, "hash", "row", "batch", 3)


def _q_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 SpanFirstQuery (dts.spans): occurrences of a term wholly
    within the first `limit` tokens of a doc — a single-slot positional
    sweep, one exact group per (query, bucket). Oracle: count matching
    1-based offsets ≤ limit in the token array."""
    from dts.spans import span_first_counts

    q = spark.createDataFrame(
        SPAN_FIRST_QS, "sq_id long, term string, limit int"
    )
    return span_first_counts(spark, _pos_index(spark, sf_dir), q)


def _q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 ordered SpanNearQuery (dts.spans): chains q_0<…<q_{m-1},
    one position per term, TOTAL span ≤ (m−1)+slop (Lucene inOrder slop
    accounting — not the engine's per-step sloppy-phrase gaps), counted
    by distinct starts via a greedy smallest-next sweep. Oracle: nested
    list_filter chain checks over the token arrays (m=2 and m=3)."""
    from dts.spans import span_near_counts

    rows = [(i, f"{a} {b}", s) for i, a, b, s in SPAN_NEAR2_QS]
    i3, a, b, c, s3 = SPAN_NEAR3_Q
    rows.append((i3, f"{a} {b} {c}", s3))
    q = spark.createDataFrame(rows, "sq_id long, text string, slop int")
    return span_near_counts(spark, _pos_index(spark, sf_dir), q)


# ES intervals (unordered + max_gaps): query 1 reverses query 0's terms
# (must produce identical rows — order-free), query 2 is a 3-term window,
# query 3 can never match.
INTERVAL_QS = [
    (0, "table scan", 2),
    (1, "scan table", 2),
    (2, "fast join data", 3),
    (3, "fast zzqqnever", 4),
]


def _interval_select(iq_id: int, terms: list[str], max_gaps: int) -> str:
    """One UNION ALL leg of the intervals oracle: the anchor-cover count
    for this query's term list (shared rule with the engine matcher)."""
    win = len(terms) + max_gaps
    any_term = " OR ".join(f"toks[j] = '{t}'" for t in terms)
    covers = " AND ".join(
        f"len(list_filter(range(j, least(j + {win - 1}, len(toks)) + 1), "
        f"q -> toks[q] = '{t}')) > 0"
        for t in terms
    )
    return f"""
SELECT * FROM (
  SELECT {iq_id}::BIGINT AS iq_id, doc_id,
         len(list_filter(range(1, len(toks) + 1),
             j -> ({any_term}) AND {covers}))::BIGINT AS n_matches
  FROM t
) WHERE n_matches > 0"""


def _q_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES intervals query — match/unordered with max_gaps (Lucene
    Intervals.maxgaps ∘ unordered; dts.spans.interval_unordered_counts):
    a doc matches iff some window of m+max_gaps consecutive positions
    holds every term, any order; n_matches counts distinct anchor
    positions whose right-window covers all terms (the documented
    convention — the matched DOC SET is Lucene's). Oracle: anchor-cover
    list_filter replay over the token arrays."""
    from dts.spans import interval_unordered_counts

    q = spark.createDataFrame(
        INTERVAL_QS, "iq_id long, text string, max_gaps int"
    )
    return interval_unordered_counts(spark, _pos_index(spark, sf_dir), q)


# (sq_id, include terms, exclude term, slop, pre, post) — m=2 spans, a
# single-term include with a pre/post window, a never-firing exclusion
# (== span_near), and a same-window self-adjacent exclusion.
SPAN_NOT_QS = [
    (0, "fast join", "scan", 2, 0, 0),
    (1, "table", "scan", 0, 1, 1),
    (2, "customer order", "zzqqnever", 1, 0, 0),
    (3, "data", "query", 0, 2, 2),
]


def _q_span_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene SpanNotQuery (dts.spans.span_not_counts): include spans
    (greedy ordered chains, the span_near budget) that do NOT overlap an
    exclude-term occurrence within [start−pre, end+post]; greedy remains
    exact because the window grows with the chain end. Oracle: per-start
    list_min greedy replay + a window list_filter emptiness check."""
    from dts.spans import span_not_counts

    q = spark.createDataFrame(
        SPAN_NOT_QS,
        "sq_id long, include string, exclude string, slop int, pre int, post int",
    )
    return span_not_counts(spark, _pos_index(spark, sf_dir), q)


def _q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 function_score / field_value_factor
    (dts.docvalues.function_score_topk): rank by bm25 · ln(1 + n_chars)
    with the doc value applied INSIDE the kernel (per-bucket colocated
    value arrays, the tombstone join shape) before top-k truncation.
    Oracle: unrounded BM25 sum × ln1p(n_chars), rounded to 6dp."""
    from dts.docvalues import function_score_topk

    q = spark.createDataFrame(
        [(i, t) for i, t in PROBE_QUERIES], "query_id long, text string"
    )
    return _rerank6_top10(
        function_score_topk(
            spark, _dv_index(spark, sf_dir), q, "n_chars", k=10**6,
            modifier="log1p", boost_mode="multiply", factor=1.0,
        )
    )


DVU_IDS = (2, 5, 8, 11)


def _q_dv_update_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene doc-values updates (dts.docvalues.update_doc_values):
    stored-field values changed WITHOUT reindexing — a fresh index's
    n_chars is rewritten for four docs (to doc_id·3+7, all below the
    corpus minimum of 48), then a range query over the sidecar must see
    exactly the updated values."""
    import tempfile

    from dts.docvalues import range_docs, update_doc_values
    from dts.index_build import build_index
    from dts.io import driver_documents_as_source

    docs = driver_documents_as_source(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "n_chars"), "doc_id"
    )
    idx = tempfile.mkdtemp(prefix="dts_dvu_idx_")
    build_index(
        spark, docs, idx, bucket_size=256, store_fields=["n_chars"]
    )
    ups = spark.createDataFrame(
        [(d, d * 3 + 7) for d in DVU_IDS], "doc_id long, n_chars long"
    )
    update_doc_values(spark, idx, ups, ["n_chars"])
    return range_docs(spark, idx, "n_chars", 0, 45)


PS_QUERIES = [
    (0, "fastt joinn"),
    (1, "tabel scann"),
    (2, "merg tabel"),
    (3, "hashh joinn"),
]


def _q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester (dts.phrasesuggest.suggest_phrases): per-token
    edit-distance candidates (the term suggester's trigram-floored spec)
    composed and re-ranked by a corpus bigram LM with Stupid Backoff —
    whole-query did-you-mean. Oracle replicates candidates, composition
    and the LM bit-for-bit."""
    from dts.phrasesuggest import bigram_counts, suggest_phrases

    bg = bigram_counts(_docs(spark, sf_dir), text_col="text")
    return suggest_phrases(
        spark, _pos_index(spark, sf_dir), PS_QUERIES, bg,
        max_k=1, per_token=3, n=3,
    )


DECAY_ORIGIN, DECAY_SCALE = 200.0, 150.0


def _q_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES decay function scoring (dts.docvalues.decay_score_topk): rank
    by bm25 · gauss(n_chars; origin=200, scale=150, decay=0.5) — the
    recency/proximity-boost shape, applied inside the kernel over the
    bucket-colocated doc-value arrays."""
    from dts.docvalues import decay_score_topk

    q = spark.createDataFrame(
        [(i, t) for i, t in PROBE_QUERIES], "query_id long, text string"
    )
    return _rerank6_top10(
        decay_score_topk(
            spark, _dv_index(spark, sf_dir), q, "n_chars",
            origin=DECAY_ORIGIN, scale=DECAY_SCALE, kind="gauss",
            k=10**6,
        )
    )


SCRIPT_SCORE_EXPR = "_score * ln(1.0e0 + n_chars) / (1.0e0 + doc_id % 3)"


def _q_script_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script_score (dts.docvalues.script_score_topk — the generic
    non-monotone rescoring escape hatch): _score · ln(1+n_chars) /
    (1 + doc_id%3) over untruncated candidates; ranks at 6 dp."""
    from dts.docvalues import script_score_topk

    q = spark.createDataFrame(
        [(i, t) for i, t in PROBE_QUERIES], "query_id long, text string"
    )
    return _rerank6_top10(
        script_score_topk(
            spark, _dv_index(spark, sf_dir), q, SCRIPT_SCORE_EXPR,
            fields=("n_chars",), k=10**6,
        )
    )


RF_PIVOT = 300.0


def _q_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_feature query (dts.docvalues.rank_feature_topk): text
    score + saturation(n_chars; pivot=300) — the static-signal boost
    (pagerank-style) composed additively like ES's bool SHOULD clause,
    applied inside the kernel over bucket-colocated doc values."""
    from dts.docvalues import rank_feature_topk

    q = spark.createDataFrame(
        [(i, t) for i, t in PROBE_QUERIES], "query_id long, text string"
    )
    return _rerank6_top10(
        rank_feature_topk(
            spark, _dv_index(spark, sf_dir), q, "n_chars",
            function="saturation", pivot=RF_PIVOT, k=10**6,
        )
    )


_MI_IDX_CACHE: dict[str, tuple[str, str]] = {}


def _q_multi_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 MultiReader search (dts.multi_index): the corpus split
    into two independently-built half-indexes (different bucket/block
    geometry on purpose), searched as ONE logical index with blended
    composite-reader stats (n = Σnᵢ, avgdl weighted, df summed). The
    oracle is the PLAIN bm25_topk oracle — segmentation must be
    invisible, bit-for-bit."""
    from dts.multi_index import multi_index_topk

    if sf_dir not in _MI_IDX_CACHE:
        import tempfile

        from dts.index_build import build_index
        from dts.io import driver_documents_as_source

        docs = driver_documents_as_source(spark, sf_dir)
        d_a = tempfile.mkdtemp(prefix="dts_mi_a_")
        d_b = tempfile.mkdtemp(prefix="dts_mi_b_")
        build_index(
            spark, docs.filter(F.col("doc_id") % 2 == 0), d_a,
            bucket_size=128,
        )
        build_index(
            spark, docs.filter(F.col("doc_id") % 2 == 1), d_b,
            bucket_size=256,
        )
        _MI_IDX_CACHE[sf_dir] = (d_a, d_b)
    d_a, d_b = _MI_IDX_CACHE[sf_dir]
    q = spark.createDataFrame(
        [(i, t) for i, t in PROBE_QUERIES], "query_id long, text string"
    )
    return _rerank6_top10(multi_index_topk(spark, [d_a, d_b], q, k=10**6))


def _q_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 score explanation (dts.explain — Lucene explain()): for
    each probe query's top-3 docs, the per-clause BM25 breakdown rows
    (term, tf, dl, df, contribution) decoded from ONLY the target docs'
    bucket slices. Oracle: the same factors recomputed in SQL over the
    rank ≤ 3 slice."""
    from dts.explain import explain_scores
    from dts.score_index import bm25_topk_indexed

    idx_dir = _pos_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(i, t) for i, t in PROBE_QUERIES], "query_id long, text string"
    )
    top3 = (
        _rerank6_top10(bm25_topk_indexed(spark, idx_dir, q, k=10**6))
        .filter(F.col("rank") <= 3)
        .collect()
    )
    doc_ids: dict[int, list[int]] = {}
    for r in top3:
        doc_ids.setdefault(int(r["query_id"]), []).append(int(r["doc_id"]))
    ex = explain_scores(spark, idx_dir, q, doc_ids)
    return ex.select(
        "query_id", "doc_id", "clause", "term", "tf", "dl", "df",
        F.round("contribution", 6).alias("contrib6"),
    )


PERC_QUERIES = [
    (0, "batch stream"),
    (1, "+hash -slow"),
    (2, '"table scan"'),
    (3, '+merge "fast join"~3'),
    (4, "zzznope"),
]


def _q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 percolation (dts.percolate — ES percolator): registered
    query strings broadcast against the documents in ONE shuffle-free
    mapInPandas pass, trigger-term pruning bounding per-doc work to the
    queries that could match. Oracle: per-query boolean/phrase legs over
    the token arrays."""
    from dts.percolate import percolate

    return percolate(_docs(spark, sf_dir), PERC_QUERIES, text_col="text")


TERM_RANGES = [
    (0, "fa", "jo", True, True),
    (1, "fa", "jo", False, False),
    (2, None, "ba", True, False),
    (3, "wi", None, True, True),
]


def _q_term_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 TermRangeQuery (dts.wildcard.term_range_docs): docs with
    ≥1 dictionary term in a [lo TO hi] range — constant-score rewrite
    over range-pruned dictionary slices + the shared decode+union tail.
    Oracle: distinct (range, doc) over the re-tokenized corpus."""
    from dts.wildcard import term_range_docs

    q = spark.createDataFrame(
        TERM_RANGES,
        "wq_id long, lo string, hi string, lo_incl boolean, hi_incl boolean",
    )
    return term_range_docs(spark, _pos_index(spark, sf_dir), q)


RESCORE_QS = [(0, "fast join"), (1, "table scan")]
RESCORE_W, RESCORE_K, RESCORE_QW, RESCORE_RW = 30, 10, 1.0, 2.0


def _q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 rescore window (dts.rescore — ES rescore with a
    match_phrase rescorer): top-30 primary BM25 candidates re-sorted by
    primary + 2·phrase_score (phrase-frequency BM25 of the whole query
    text, dts.oracle.phrase_bm25_score spec). The expensive signal runs
    on the bounded window only. Oracle: the same two-phase ranking in
    SQL."""
    from dts.rescore import rescore_topk

    q = spark.createDataFrame(RESCORE_QS, "query_id long, text string")
    return _rerank6_top10(
        rescore_topk(
            spark, _pos_index(spark, sf_dir), q,
            k=RESCORE_K, window=RESCORE_W,
            query_weight=RESCORE_QW, rescore_weight=RESCORE_RW,
        )
    )


HIST_INTERVAL = 100.0


def _q_facet_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 histogram aggregation (dts.facet.facet_histogram_indexed
    — ES histogram agg): n_chars bucketed into fixed 100-wide steps for
    each query's top-10 BM25 hits, answered from the doc_meta sidecar
    alone. Oracle: the same floor-bucketing over the rank ≤ 10 slice."""
    from dts.facet import facet_histogram_indexed
    from dts.score_index import bm25_topk_indexed

    idx_dir = _dv_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    top = _rerank6_top10(bm25_topk_indexed(spark, idx_dir, q, k=10**6))
    return facet_histogram_indexed(
        spark, idx_dir, "n_chars", HIST_INTERVAL,
        matches=top, key="query_id",
    )


SYN_MAP = {"fast": ["quick", "slow"], "join": ["merge"]}
SYN_QUERIES = [(0, "fast scan"), (1, "join table"), (2, "merge join")]


def _q_synonym_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 SynonymQuery (dts.synonym): a mapped token scores as ONE
    blended pseudo-term — per-doc tf summed across members, docFreq =
    MAX member df (Lucene's stats blend; 'quick' is a dead member, which
    the blend ignores). Member postings merge per (clause, bucket) and
    ride the scoring kernel as synthetic clause rows — one scoring job.
    Oracle: the same blend in SQL (sum-tf subquery × max-df scalar)."""
    from dts.synonym import bm25_topk_synonyms

    q = spark.createDataFrame(SYN_QUERIES, "query_id long, text string")
    return _rerank6_top10(
        bm25_topk_synonyms(
            spark, _pos_index(spark, sf_dir), q, SYN_MAP, k=10**6
        )
    )


PP_QUERIES = [(0, "table sc"), (1, "fast jo"), (2, "ha")]
PP_MAX_EXP = 50


def _q_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 match_phrase_prefix (dts.phrase.phrase_prefix_counts —
    ES/Lucene MultiPhraseQuery shape): leading words consecutive, the
    final slot satisfied by any of the first 50 dictionary expansions of
    the prefix (ES max_expansions truncation). One positional job: each
    expansion is one phrase row in a single phrase_match_counts batch;
    per-start disjointness makes the per-(query, doc) SUM exact."""
    from dts.phrase import phrase_prefix_counts

    q = spark.createDataFrame(PP_QUERIES, "pp_id long, text string")
    return phrase_prefix_counts(
        spark, _pos_index(spark, sf_dir), q, max_expansions=PP_MAX_EXP
    )


# cross_fields probe: the second field ("head" = first 8 tokens of text)
# SHARES vocabulary with text, so the df blend (max across fields) is
# genuinely exercised; 2-token queries keep every float sum at ≤2
# addends (cross-engine association safety).
CF_QUERIES = [
    (0, "fast join"),
    (1, "table scan"),
    (2, "key value"),
    (3, "spark zzqq"),
]
CF_BOOSTS = {"text": 1.0, "head": 2.0}
CF_TIE = 0.3
_HEAD_SQL = (
    "array_join(slice(regexp_extract_all(lower(coalesce(text, '')),"
    f" '{TOK}', 0), 1, 8), ' ')"
)


def _q_cross_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match type=cross_fields (dts.multifield.cross_fields_topk):
    term-centric blended-df scoring — per term, every field scores with
    df replaced by max over fields (Lucene BlendedTermQuery), per-doc
    dismax with tie_breaker across fields, sum over terms. The oracle
    recomputes the blend relationally; ranks compared at 6 dp."""
    import tempfile

    from dts.io import driver_documents_as_source
    from dts.multifield import build_multifield_index, cross_fields_topk

    docs = (
        driver_documents_as_source(spark, sf_dir)
        .withColumnRenamed("content", "text")
        .withColumn("head", F.expr(_HEAD_SQL))
    )
    d = tempfile.mkdtemp(prefix="dts_cf_idx_")
    build_multifield_index(spark, docs, d, CF_BOOSTS, bucket_size=256)
    q = spark.createDataFrame(CF_QUERIES, "query_id long, text string")
    out = cross_fields_topk(spark, d, q, k=10, tie_breaker=CF_TIE)
    return out.select("query_id", "doc_id", "rank")


def _q_combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match type=combined_fields / Lucene CombinedFieldQuery
    (dts.multifield.combined_fields_topk — true BM25F-style): weighted
    term frequencies summed ACROSS fields into one saturation with a
    combined length norm; df = min(n_docs, Σ_f df_f) (Lucene's merged
    TermStatistics). The oracle recomputes the exact formula relationally;
    ranks compared at 6 dp."""
    import tempfile

    from dts.io import driver_documents_as_source
    from dts.multifield import build_multifield_index, combined_fields_topk

    docs = (
        driver_documents_as_source(spark, sf_dir)
        .withColumnRenamed("content", "text")
        .withColumn("head", F.expr(_HEAD_SQL))
    )
    d = tempfile.mkdtemp(prefix="dts_cbf_idx_")
    build_multifield_index(spark, docs, d, CF_BOOSTS, bucket_size=256)
    q = spark.createDataFrame(CF_QUERIES, "query_id long, text string")
    out = combined_fields_topk(spark, d, q, k=10)
    return out.select("query_id", "doc_id", "rank")


# Multi-field probe: text is the default field (boost 1.0), source is a
# scoped field (boost 0.5); includes a source-only query and a miss.
MF_QUERIES = [
    (0, "fast join"),
    (1, "source:src3 fast"),
    (2, "source:src7"),
    (3, "table scan source:src1"),
    (4, "data source:zzqq"),
]
MF_BOOSTS = {"text": 1.0, "source": 0.5}


def _mf_routed() -> dict[str, list[tuple[int, str]]]:
    """(query_id, term) rows per field after clause routing — shared by
    the engine call's expectations and the oracle VALUES."""
    out: dict[str, list[tuple[int, str]]] = {"text": [], "source": []}
    for qid, text in MF_QUERIES:
        for clause in text.split():
            f, sep, rest = clause.partition(":")
            if sep and f in MF_BOOSTS and rest:
                out[f].append((qid, rest))
            else:
                out["text"].append((qid, clause))
    return out


# Round-5 scored-phrase probe (phrase_mode='scored' — Lucene PhraseQuery
# parity): the phrase scores as ONE clause (tf = per-doc phrase
# frequency, df = docs containing the phrase); query 2 mixes a scoring
# term with a phrase.
PHRASE_SCORED_QUERIES = ['"fast join"', '"customer order"', 'data "fast join"']


# Round-5 unified-grammar probe (dts.parser.search_fields): field-scoped
# atoms with +/- modifiers and a quoted phrase over the same two-field
# index; text is the default field.
SF_QUERIES = [
    (0, "fast join"),
    (1, "fast +join"),
    (2, "fast -source:src3"),
    (3, "source:src1 +fast"),
    (4, 'data "fast join"'),
]


def _sf_routed():
    """Per-field routed clause lists for the unified-grammar probe,
    derived from the SAME parser the engine uses (probe and oracle stay
    in lockstep): field → scoring / MUST / MUST_NOT (query_id, term)
    rows, plus (query_id, phrase) constraints on the text field."""
    from dts.parser import parse_query

    score: dict[str, list] = {"text": [], "source": []}
    must: dict[str, list] = {"text": [], "source": []}
    nots: dict[str, list] = {"text": [], "source": []}
    phrases: list[tuple[int, str]] = []
    for qid, text in SF_QUERIES:
        pq = parse_query(text, fields=MF_BOOSTS, default_field="text")
        for f_name, part in {"text": pq, **pq.fielded}.items():
            score[f_name].extend(
                (qid, t)
                for t in part.score_terms + part.phrase_terms + part.must
            )
            must[f_name].extend((qid, t) for t in part.must)
            nots[f_name].extend((qid, t) for t in part.must_not)
            for ph in part.phrases:
                assert f_name == "text", "oracle phrases are text-field"
                phrases.append((qid, ph))
    return score, must, nots, phrases


DELETE_PRED_MOD = 7  # tombstone doc_id % 7 == 3 in the deletion probes
DELETE_PRED_REM = 3
# Substring patterns for the snippet probe (incl. a cross-token pattern
# and a guaranteed miss) and the shared context width.
SNIPPET_PATTERNS = [(0, "fast join"), (1, "merge"), (2, "customer order"), (3, "zzqq")]
SNIPPET_W = 12


def _rerank6_top10(full: DataFrame) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        full.withColumn("r6", F.row_number().over(w))
        .filter(F.col("r6") <= 10)
        .select("query_id", "doc_id", F.col("r6").alias("rank"))
    )


def _deleted_index(spark: SparkSession, sf_dir: str, compact: bool) -> str:
    """Fresh index over the driver docs with doc_id % 7 == 3 tombstoned;
    optionally compacted (physical delete + exact stat recompute). Fresh
    per call: probes must not share mutable index state."""
    import tempfile

    from dts.delete import delete_docs
    from dts.index_build import build_index, compact_index
    from dts.io import driver_documents_as_source

    docs = driver_documents_as_source(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="dts_del_idx_")
    build_index(spark, docs, d, bucket_size=256)
    delete_docs(
        spark, d,
        docs.filter(
            F.col("doc_id") % DELETE_PRED_MOD == DELETE_PRED_REM
        ).select("doc_id"),
    )
    if compact:
        compact_index(spark, d)
    return d


def _q_bm25_topk_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-phase deletion semantics (Lucene live-docs): deleted docs
    are masked BEFORE top-k truncation, but corpus stats (n_docs, avgdl,
    df) still count them until compaction. Oracle: full-stats BM25 scored
    set, deleted docs filtered before ranking."""
    from dts.score_index import bm25_topk_indexed

    d = _deleted_index(spark, sf_dir, compact=False)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(bm25_topk_indexed(spark, d, q, k=10**6))


def _q_bm25_topk_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-compaction deletion semantics: physical removal + exact stat
    recompute — results must equal a FRESH build over the live corpus.
    Oracle: the same BM25 SQL computed over the filtered documents table
    (stats and all)."""
    from dts.score_index import bm25_topk_indexed

    d = _deleted_index(spark, sf_dir, compact=True)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(bm25_topk_indexed(spark, d, q, k=10**6))


FILTER_LANGS = ("en", "fr")


def _q_bm25_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 filter context (Lucene's non-scoring filter clause): only
    docs with lang ∈ FILTER_LANGS are RANKED — masked before top-k
    truncation through the same colocated (bucket, id array) join as
    tombstones — while scores keep FULL-corpus statistics. Oracle: the
    full-stats scored CTE, filtered to member docs just before ranking."""
    from dts.score_index import bm25_topk_indexed

    flt = _docs(spark, sf_dir).filter(
        F.col("lang").isin(list(FILTER_LANGS))
    ).select("doc_id")
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(
        bm25_topk_indexed(
            spark, _pos_index(spark, sf_dir), q, k=10**6, doc_filter=flt
        )
    )


def _q_bm25_topk_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (Lucene default-AND) ranking: only docs containing ALL
    query clauses are ranked; scores stay the disjunctive BM25 sums.
    Oracle: the scored CTE filtered by per-doc distinct-term presence ==
    the query's distinct term count."""
    from dts.score_index import bm25_topk_indexed

    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(
        bm25_topk_indexed(spark, _pos_index(spark, sf_dir), q, k=10**6, mode="and")
    )


def _q_facet_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet counts over the lang field for the boolean matches
    (dts.facet composed on dts.boolquery): broadcast hit list ⋈ pruned
    (doc_id, lang) projection → hash agg."""
    from dts.boolquery import boolean_match_docs
    from dts.facet import facet_counts

    bq = spark.createDataFrame(
        BOOL_QUERIES, "bq_id long, must string, must_not string"
    )
    matches = boolean_match_docs(spark, _pos_index(spark, sf_dir), bq)
    return facet_counts(
        matches, _docs(spark, sf_dir), "lang", key="bq_id"
    )


def _q_facet_lang_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet counts answered by the INDEX ALONE (round-5 late: doc_meta
    stored-fields sidecar, build_index(store_fields=['lang'])): the doc
    side is the metadata projection persisted at build time — no join
    back to the documents table at query time. Same boolean matches and
    the same SQL oracle as facet_lang; only the metadata source moves
    into the index."""
    import tempfile

    from dts.boolquery import boolean_match_docs
    from dts.facet import facet_counts_indexed
    from dts.index_build import build_index
    from dts.io import driver_documents_as_source

    docs = driver_documents_as_source(spark, sf_dir)  # carries lang
    d = tempfile.mkdtemp(prefix="dts_sc_idx_")
    build_index(spark, docs, d, bucket_size=256, store_fields=["lang"])
    bq = spark.createDataFrame(
        BOOL_QUERIES, "bq_id long, must string, must_not string"
    )
    matches = boolean_match_docs(spark, d, bq)
    return facet_counts_indexed(spark, d, matches, "lang", key="bq_id")


def _q_multifield_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-scoped queries with boosts (dts.multifield): one sub-index
    per field sharing doc_ids, per-field BM25 (per-field stats — the
    BM25F-lite requirement), weighted union-sum, global top-k. Oracle:
    two scored CTEs (text boost 1.0, source boost 0.5) summed."""
    import tempfile

    from pyspark.sql import Window as W

    from dts.io import driver_documents_as_source
    from dts.multifield import bm25_topk_multifield, build_multifield_index

    docs = driver_documents_as_source(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "source"), "doc_id"
    ).withColumnRenamed("content", "text")
    d = tempfile.mkdtemp(prefix="dts_mf_idx_")
    build_multifield_index(spark, docs, d, MF_BOOSTS, bucket_size=256)
    q = spark.createDataFrame(MF_QUERIES, "query_id long, text string")
    full = bm25_topk_multifield(spark, d, q, k=10**6, default_field="text")
    w = W.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        full.withColumn("r6", F.row_number().over(w))
        .filter(F.col("r6") <= 10)
        .select("query_id", "doc_id", F.col("r6").alias("rank"))
    )


DISMAX_TIE = 0.3


def _q_dismax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene DisjunctionMaxQuery across fields: the best field's
    (boosted) BM25 wins, plus tie_breaker × the other fields' sum —
    search_fields(combine='dismax') over the same two-field index as
    multifield_topk. Oracle: max + tie·(sum − max) over the two scored
    CTEs."""
    import tempfile

    from dts.io import driver_documents_as_source
    from dts.multifield import build_multifield_index
    from dts.parser import search_fields

    docs = driver_documents_as_source(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "source"), "doc_id"
    ).withColumnRenamed("content", "text")
    d = tempfile.mkdtemp(prefix="dts_dm_idx_")
    build_multifield_index(spark, docs, d, MF_BOOSTS, bucket_size=256)
    full = search_fields(
        spark, d, [t for _, t in MF_QUERIES], k=10**6,
        default_field="text", combine="dismax", tie_breaker=DISMAX_TIE,
    )
    return _rerank6_top10(full)


def _q_phrase_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 phrase-frequency scoring (dts.parser search_batch
    phrase_mode='scored'): quoted phrases score as units — one clause
    with tf = phrase occurrences (positional intersection) and df =
    docs containing the phrase, exact BM25 formula (spec
    dts.oracle.phrase_bm25_score); phrase words do NOT individually
    score. Oracle recounts phrases on the token stream and replays the
    formula."""
    from pyspark.sql import Window as W

    from dts.parser import search_batch

    full = search_batch(
        spark, _pos_index(spark, sf_dir), PHRASE_SCORED_QUERIES,
        k=10**6, phrase_mode="scored",
    )
    w = W.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        full.withColumn("score6", F.round("score", 6))
        .withColumn("r6", F.row_number().over(w))
        .filter(F.col("r6") <= 10)
        .select("query_id", "doc_id", "score6", F.col("r6").alias("rank"))
    )


def _q_search_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 unified grammar over a multifield index
    (dts.parser.search_fields): field-scoped atoms with +/- modifiers
    and a quoted phrase — one flags-candidates job per field
    (shard_candidates_mixed), cross-field MUST/MUST_NOT enforced in the
    hash-agg combine, fused phrase allow join, weighted per-field BM25
    sum, round-6 re-rank."""
    import tempfile

    from dts.io import driver_documents_as_source
    from dts.multifield import build_multifield_index
    from dts.parser import search_fields

    docs = driver_documents_as_source(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "source"), "doc_id"
    ).withColumnRenamed("content", "text")
    d = tempfile.mkdtemp(prefix="dts_sf_idx_")
    build_multifield_index(
        spark, docs, d, MF_BOOSTS, bucket_size=256, positions=True
    )
    full = search_fields(
        spark, d, [t for _, t in SF_QUERIES], k=10**6,
        default_field="text",
    )
    return _rerank6_top10(full)


def _q_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First case-insensitive occurrence of each pattern + a ±12-char
    context window (dts.snippet — pure JVM instr/substring, broadcast
    pattern side). Oracle: strpos/substring, char-for-char."""
    from dts.snippet import snippet_matches

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").alias("content")
    )
    pat = spark.createDataFrame(SNIPPET_PATTERNS, "pat_id long, pattern string")
    return snippet_matches(docs, pat, width=SNIPPET_W)


def _q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed results page: round-6 re-ranked BM25 top-10 joined
    back to the source table with a snippet of the query's first term.
    The top-k doc_ids are driver-known (client-sized page), so the docs
    scan carries an IN-list doc_id pushdown — row-group pruning turns the
    corpus scan into a point lookup (round-4 verdict fix)."""
    from dts.score_index import bm25_topk_indexed
    from dts.snippet import _snippet_cols

    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    top_df = _rerank6_top10(
        bm25_topk_indexed(spark, _pos_index(spark, sf_dir), q, k=10**6)
    )
    top_rows = top_df.collect()
    ids = sorted({int(r["doc_id"]) for r in top_rows})
    top = spark.createDataFrame(top_rows, top_df.schema)
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").alias("content")
    ).where(F.col("doc_id").isin(ids))
    fterms = spark.createDataFrame(
        [(i, t.split()[0]) for i, t in PROBE_QUERIES],
        "query_id long, fterm string",
    )
    pos, snip = _snippet_cols("content", "fterm", SNIPPET_W)
    return (
        docs.join(F.broadcast(top), "doc_id")
        .join(F.broadcast(fterms), "query_id")
        .select(
            "query_id", "doc_id", "rank",
            pos.alias("pos"), snip.alias("snippet"),
        )
    )


REGEX_PATTERNS = [
    (0, "fa[a-z]+"),
    (1, "(jo|sc)[a-z]*n"),
    (2, "qu.ry"),
    (3, "zz[0-9]+"),
    (4, "[a-f]+"),
]


SAMPLE_SEED = "s7"
SAMPLE_FRACTIONS = {"en": 1.0, "zh": 0.0, "es": 0.35}
SAMPLE_DEFAULT = 0.6


def _q_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 deterministic stratified sampling (dts.sample): per-lang
    keep fractions via an md5 hash cut — stable across partitionings,
    retries and ENGINES (md5 is bit-identical in Spark and DuckDB), so
    the oracle checks exact membership, not counts."""
    from dts.sample import stratified_hash_sample

    return stratified_hash_sample(
        _docs(spark, sf_dir),
        SAMPLE_FRACTIONS,
        stratum_col="lang",
        seed=SAMPLE_SEED,
        default_fraction=SAMPLE_DEFAULT,
    ).select("doc_id", "lang")


def _q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 end-to-end dedup policy (dts.dedup.dedup_corpus): the
    CLEANED corpus after dropping all but the minimum-doc_id member of
    each byte-identical group. Oracle: min window over md5(text)."""
    from dts.dedup import dedup_corpus

    return dedup_corpus(_docs(spark, sf_dir), method="exact").select(
        "doc_id", "lang"
    )


def _q_regex_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 RegexpQuery surface: anchored whole-term regex expansion
    over the vocabulary (literal-prefix range pushdown like wildcards),
    counts resolved from term_stats.cf alone. Oracle: regexp_matches with
    ^(?:p)$ anchoring over the token multiset."""
    from dts.wildcard import regex_match_counts

    rq = spark.createDataFrame(REGEX_PATTERNS, "rq_id long, pattern string")
    return regex_match_counts(spark, _pos_index(spark, sf_dir), rq)


def _q_wildcard_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard term counting resolved from term_stats.cf alone
    (dts.wildcard): the literal prefix pushes down as a range predicate on
    the term-sorted vocabulary; postings are never read. Oracle: token
    LIKE with * → %."""
    from dts.wildcard import wildcard_match_counts

    wq = spark.createDataFrame(WILDCARD_PATTERNS, "wq_id long, pattern string")
    return wildcard_match_counts(spark, _pos_index(spark, sf_dir), wq)


def _q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard BM25 top-k: dictionary-range expansion then Lucene-style
    BooleanQuery rewrite (each matched term scores once with its own idf),
    re-ranked on round-6 scores against the SQL oracle."""
    from pyspark.sql import Window as W

    from dts.wildcard import bm25_topk_wildcard

    wq = spark.createDataFrame(WILDCARD_PATTERNS, "wq_id long, pattern string")
    full = bm25_topk_wildcard(spark, _pos_index(spark, sf_dir), wq, k=10**6)
    w = W.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        full.withColumn("r6", F.row_number().over(w))
        .filter(F.col("r6") <= 10)
        .select("query_id", "doc_id", F.col("r6").alias("rank"))
    )


def _q_wildcard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-score wildcard matching (Lucene's rewrite for wide
    patterns): docs containing ≥1 matching term, no scoring — one decode +
    union per (pattern, bucket) group."""
    from dts.wildcard import wildcard_match_docs

    wq = spark.createDataFrame(WILDCARD_PATTERNS, "wq_id long, pattern string")
    return wildcard_match_docs(spark, _pos_index(spark, sf_dir), wq)


def _q_boolean_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean MUST / MUST_NOT document matching resolved purely from the
    compressed postings (dts.boolquery — numpy set algebra inside exact,
    globally disjoint (query, bucket) groups; no corpus rescan). Oracle:
    list_has_all / list_has_any over the token array."""
    from dts.boolquery import boolean_match_docs

    bq = spark.createDataFrame(
        BOOL_QUERIES, "bq_id long, must string, must_not string"
    )
    return boolean_match_docs(spark, _pos_index(spark, sf_dir), bq)


SEARCH_QUERY = 'fast +join -slow "table scan"'
MLT_SEEDS = [3, 57, 201]
SUGGEST_INPUTS = ["fastt", "joon", "tabel", "zzzznope"]


def _q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 did-you-mean (dts.suggest): nearest vocabulary terms per
    misspelled input, ranked (distance ASC, cf DESC, term ASC).
    Candidates follow the engine's n-gram generation rule (shared
    trigrams ≥ max(1, |tri|−3k), |len Δ| ≤ k — Lucene-spellchecker
    shape); the oracle implements the same rule."""
    from dts.suggest import suggest_terms

    return suggest_terms(
        spark, _pos_index(spark, sf_dir), SUGGEST_INPUTS, max_k=2, n=5
    )


COMPLETE_PREFIXES = ["s", "co", "ta", "zzq"]


def _q_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 prefix completion (dts.suggest.complete_prefix — Lucene
    suggest/completion shape): top-5 dictionary terms per prefix ranked
    (cf DESC, term ASC), served by range-pruned scans of the term-sorted
    dictionary. Oracle: the same ranking over the re-tokenized corpus."""
    from dts.suggest import complete_prefix

    return complete_prefix(
        spark, _pos_index(spark, sf_dir), COMPLETE_PREFIXES, n=5
    )


MLT_MAX_TERMS, MLT_MIN_DF = 25, 2


def _q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 MoreLikeThis (dts.mlt): seed term vectors from the stored
    sidecar when the index has one (round-5 — this one does; falls back
    to bucket-postings reconstruction), top-25 tf·idf terms (df ≥ 2,
    round-9 tiebreak by term), disjunctive BM25 over the selection with
    the seed excluded from its own results. Oracle: the same selection +
    scoring in SQL."""
    from dts.mlt import more_like_this

    return _rerank6_top10(
        more_like_this(
            spark, _pos_index(spark, sf_dir), MLT_SEEDS, k=10**6,
            max_terms=MLT_MAX_TERMS, min_df=MLT_MIN_DF,
        )
    )


def _q_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 one-call Lucene-style query string (dts.parser.search):
    bare + MUST terms score disjunctively; +join / -slow / the quoted
    phrase resolve to a doc-id constraint riding the filter context.
    Oracle: the scored CTE over the multiset [fast, table, scan, join],
    filtered to docs containing join, not slow, and the bigram
    'table scan'."""
    from dts.parser import search

    return _rerank6_top10(
        search(spark, _pos_index(spark, sf_dir), SEARCH_QUERY, k=10**6)
    )


# Nested boolean trees (dts.qtree): precedence grammar NOT > AND > OR,
# parens group, ~N = group minimum_should_match, ^N = group boost.
BOOL_TREE_QUERIES = [
    "fast AND (join OR scan)",
    "table OR (customer AND order)",
    "(fast join scan)~2",
    "query NOT (slow OR merge)",
    "(table scan)^2 OR data",
    "fast AND (join OR scan) AND NOT slow",
]


def _q_bool_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 nested boolean queries (dts.qtree.search_bool): the whole
    batch of parenthesized AND/OR/NOT trees — incl. group msm and group
    boost — resolves in ONE scoring job; the kernel folds each tree
    bottom-up over per-leaf doc sets (Lucene BooleanQuery semantics: a
    leaf scores only when its entire ancestor path matched). Oracle:
    per-term contribution pivot + closed-form match/score expressions
    per tree shape."""
    from dts.qtree import search_bool

    return _rerank6_top10(
        search_bool(
            spark, _pos_index(spark, sf_dir), BOOL_TREE_QUERIES, k=10**6
        )
    )


def _q_boolean_should(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 BooleanQuery completion: SHOULD clauses with
    minimum_should_match (Lucene defaults: msm 0 with MUST, 1 without;
    SHOULD-only queries resolve as a counted union). Oracle: per-doc count
    of contained should-terms via list_filter/list_contains."""
    from dts.boolquery import boolean_match_docs

    bq = spark.createDataFrame(
        BOOL_SHOULD_QUERIES,
        "bq_id long, must string, should string, must_not string, msm int",
    )
    return boolean_match_docs(spark, _pos_index(spark, sf_dir), bq)


def _q_fuzzy_expand_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine fuzzy expansion (trigram candidates + banded-DP verify UDF)
    vs a DuckDB oracle implementing the same candidate rule + levenshtein."""
    from dts.fuzzy import expand_fuzzy_terms

    vocab = _tok(spark, sf_dir).select("term").distinct()
    fz = spark.createDataFrame(
        [(i, t, 2) for i, t in FUZZY_TERMS],
        "query_id long, qterm string, fuzzy_k int",
    )
    return expand_fuzzy_terms(fz, vocab).withColumnRenamed("query_id", "fq_id")


# --------------------------------------------------------------------------
# training-data pipeline probes (dedup / similarity / text analysis)
# --------------------------------------------------------------------------


def _q_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.dedup import exact_canonical

    return exact_canonical(_docs(spark, sf_dir))


def _q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.dedup import minhash_signatures

    sig = minhash_signatures(_docs(spark, sf_dir), n_hashes=8, n=3)
    return sig.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, 1), b -> struct(b AS band, "
                "array_join(slice(sig, b * 4 + 1, 4), '|') AS key))"
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf_dir), n=1, threshold=0.3)


TV_FETCH_IDS = (2, 5, 11, 42)


def _q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene TermVectors (dts.termvectors): per-doc (term, tf) for a
    client-sized page of docs, answered by the doc-major sidecar with
    IN-list row-group pushdown — no postings decode, no corpus scan."""
    from dts.termvectors import term_vectors

    return term_vectors(
        spark, _pos_index(spark, sf_dir), doc_ids=list(TV_FETCH_IDS)
    )


def _q_lmd_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable similarity #3: Lucene LMDirichletSimilarity (μ=2000,
    Dirichlet-smoothed query likelihood, per-term floor at 0) over the
    same index that serves BM25 and ClassicSimilarity — term_stats
    already persists cf, so one build serves all three kernels
    (dts.score.lmd_impact)."""
    from dts.score_index import bm25_topk_indexed

    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(
        bm25_topk_indexed(
            spark, _pos_index(spark, sf_dir), q, k=10**6, similarity="lmd",
        )
    )


def _q_sig_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms (dts.facet.significant_terms): terms
    overrepresented in each boolean query's matched docs vs the corpus
    background, JLH-scored, top-5 per query. Background answered by the
    index's persisted term_stats (significant_terms_indexed) — the
    corpus is only tokenized for the hit-sized foreground."""
    from dts.boolquery import boolean_match_docs
    from dts.facet import significant_terms_indexed

    bq = spark.createDataFrame(
        BOOL_QUERIES, "bq_id long, must string, must_not string"
    )
    idx = _pos_index(spark, sf_dir)
    matches = boolean_match_docs(spark, idx, bq)
    return significant_terms_indexed(
        spark, idx, matches, _docs(spark, sf_dir), key="bq_id",
        size=5, min_doc_count=2,
    )


def _q_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_hits sub-aggregation (dts.facet.top_hits): per
    (query, lang) group, the 2 best BM25 hits — deterministic
    (score6 desc, doc_id asc) within each facet bucket."""
    from dts.facet import top_hits

    scores = _bm25_scored(spark, sf_dir).select(
        "query_id", "doc_id", "score6"
    )
    return top_hits(
        scores, _docs(spark, sf_dir), "lang", key="query_id", n=2,
        score_col="score6",
    )


def _bool_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.boolquery import boolean_match_docs

    bq = spark.createDataFrame(
        BOOL_QUERIES, "bq_id long, must string, must_not string"
    )
    return boolean_match_docs(spark, _pos_index(spark, sf_dir), bq)


def _q_facet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats aggregation (dts.facet.facet_stats): n/min/max/
    sum/avg/variance of n_chars over each boolean query's matches —
    variance from integer power sums, engine-portable bit-for-bit."""
    from dts.facet import facet_stats

    return facet_stats(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), "n_chars",
        key="bq_id",
    )


FACET_RANGES = (
    ("short", None, 250.0),
    ("mid", 250.0, 320.0),
    ("long", 320.0, None),
    ("all", None, None),          # overlaps every other bucket (ES allows)
    ("none", 10000.0, None),      # empty — ES emits 0-count buckets
)


def _q_facet_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation (dts.facet.facet_range): explicit
    [from, to) buckets over n_chars per boolean query — overlapping
    ranges count a doc in every containing bucket and empty buckets are
    emitted at 0, both ES semantics."""
    from dts.facet import facet_range

    return facet_range(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), "n_chars",
        list(FACET_RANGES), key="bq_id",
    )


def _q_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent pipeline aggregations (dts.facet.pipeline_aggs) over the
    daily date_histogram of the events stream: derivative,
    cumulative_sum, trailing-3 moving average, serial_diff at lag 7.
    Integer metric end-to-end except ONE float division for the moving
    average (rounded 6 dp on both sides)."""
    from dts.facet import facet_date_histogram, pipeline_aggs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = facet_date_histogram(None, ev, "ts", "day")
    return pipeline_aggs(b, "bucket_ts", "n", window=3, lag=7)


def _q_facet_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram with CALENDAR intervals (dts.facet.
    facet_date_histogram): corpus-wide weekly + daily buckets over the
    events stream — week = ISO Monday truncation, identical in Spark and
    DuckDB (the parity this probe pins)."""
    from dts.facet import facet_date_histogram

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = None
    for iv in ("week", "day"):
        part = facet_date_histogram(None, ev, "ts", iv).select(
            F.lit(iv).alias("calendar_interval"), "bucket_ts", "n"
        )
        out = part if out is None else out.unionByName(part)
    return out


COMPOSITE_SIZE = 5


def _q_composite_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation (dts.facet.facet_composite): paginate
    the (lang terms, n_chars/200 histogram) bucket space in key order —
    page 1 is collected, its after_key drives page 2 (the returned
    frame). Oracle: ORDER BY key LIMIT size OFFSET size (total key
    order makes after-key paging ≡ offset paging)."""
    from dts.facet import composite_after_key, facet_composite

    docs = _docs(spark, sf_dir)
    srcs = [
        ("lang", "lang"),
        ("chars_bin", (F.floor(F.col("n_chars") / 200) * 200).cast("long")),
    ]
    page1 = facet_composite(docs, srcs, size=COMPOSITE_SIZE).collect()
    after = composite_after_key(page1)
    return facet_composite(docs, srcs, size=COMPOSITE_SIZE, after=after)


FACET_FILTERS = {
    "short": "n_chars < 250",
    "en": "lang = 'en'",
    "impossible": "n_chars > 100000",
}


def _q_facet_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters aggregation (dts.facet.facet_filters): named predicate
    buckets compiled into ONE codegen pass per boolean query's matches;
    every named bucket emitted even at 0."""
    from dts.facet import facet_filters

    return facet_filters(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir),
        dict(FACET_FILTERS), key="bq_id",
    )


def _q_facet_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality aggregation (dts.facet.facet_cardinality, exact
    probe path; approx_count_distinct HLL++ is the 100-TB path)."""
    from dts.facet import facet_cardinality

    return facet_cardinality(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), "source",
        key="bq_id",
    )


HAS_CHILD_PRED = "l_quantity >= 45 AND l_discount <= 0.02"
HAS_PARENT_PRED = "o_orderpriority = '1-URGENT' AND o_totalprice >= 150000"


def _q_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_child join query (dts.joinquery.has_child): orders having
    ≥ 2 lineitems matching the child predicate, scored by the MAX child
    score (order-free float mode — the cross-engine-safe choice; child
    _score = l_extendedprice)."""
    from dts.joinquery import has_child

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "_score", F.col("l_extendedprice")
    )
    out = has_child(
        orders, li, "o_orderkey", "l_orderkey", HAS_CHILD_PRED,
        score_mode="max", min_children=2,
    )
    return out.select(
        "o_orderkey", "o_orderstatus", "n_children",
        F.round("_score", 6).alias("child_score"),
    )


def _q_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_parent join query (dts.joinquery.has_parent): lineitems
    whose parent order matches the parent predicate — a key semi-join
    (broadcastable after the selective parent filter)."""
    from dts.joinquery import has_parent

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = has_parent(
        orders, li, "o_orderkey", "l_orderkey", HAS_PARENT_PRED
    )
    return out.select("l_orderkey", "l_linenumber")


BLOCKLIST = ["data", "query"]


MBP_QUERIES = [(0, "fast jo"), (1, "table sc"), (2, "da"), (3, "fast zzqq")]


def _q_match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_bool_prefix (dts.wildcard.match_bool_prefix_topk — the
    search-as-you-type scoring query): all-but-last tokens are SHOULD
    term clauses, the last token a prefix clause expanded to the first
    50 dictionary terms in term order, every expansion scoring as its
    own clause. Query 3's prefix matches nothing — the exact clause
    still scores."""
    from dts.wildcard import match_bool_prefix_topk

    q = spark.createDataFrame(MBP_QUERIES, "query_id long, text string")
    out = match_bool_prefix_topk(
        spark, _pos_index(spark, sf_dir), q, k=10, max_expansions=50
    )
    return out.select("query_id", "doc_id", "rank")


def _q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/MassiveText corpus line-dedup (dts.dedup.
    dedup_paragraphs): lines ≥ 15 chars occurring ≥ 2× corpus-wide cut
    from every doc, docs rebuilt in order. Newlines planted with a shared
    replace expression (the raw corpus is single-line)."""
    from dts.dedup import dedup_paragraphs

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("replace(coalesce(text, ''), ' table ', char(10))").alias(
            "text"
        ),
    )
    return dedup_paragraphs(docs, min_count=2, min_line_chars=15)


def _q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter (dts.textstats.blocklist_filter): drop
    any doc containing a blocklisted token — one codegen map pass."""
    from dts.textstats import blocklist_filter

    return blocklist_filter(_docs(spark, sf_dir), BLOCKLIST).select(
        "doc_id", "lang"
    )


def _q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg aggregation (dts.facet.weighted_avg): Σ(v·w)/Σ(w)
    of n_chars per boolean query's hits, integer value/weight → exact
    sums, one deterministic division."""
    from dts.facet import weighted_avg

    docs = _docs(spark, sf_dir).withColumn(
        "w", (F.col("doc_id") % 5 + 1).cast("long")
    )
    return weighted_avg(
        _bool_matches(spark, sf_dir), docs, "n_chars", "w", key="bq_id"
    )


def _q_bucket_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES max_bucket/min_bucket/sum_bucket/avg_bucket pipeline aggs
    (dts.facet.bucket_extrema) over the daily events histogram; extreme
    bucket keys emitted as sorted comma-joined strings (ES keys arrays)."""
    from dts.facet import bucket_extrema, facet_date_histogram

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = facet_date_histogram(None, ev, "ts", "day")
    out = bucket_extrema(b, "bucket_ts", "n")
    return out.select(
        "min_value", "max_value", "sum_value", "avg_value",
        F.array_join("min_keys", ",").alias("min_keys"),
        F.array_join("max_keys", ",").alias("max_keys"),
    )


PR_VALUES = (200.0, 400.0, 800.0)


def _q_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks aggregation (dts.facet.facet_percentile_ranks
    — the inverse of percentiles): % of each boolean query's hits with
    n_chars ≤ each requested value; integer counts, one division."""
    from dts.facet import facet_percentile_ranks

    return facet_percentile_ranks(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), "n_chars",
        key="bq_id", values=PR_VALUES,
    )


def _q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix aggregation (dts.facet.adjacency_matrix):
    per boolean query, doc counts for every named filter and every
    pairwise intersection ("a&b" keys) — one scan, when()-array +
    sorted-self-pair explode, no filters² replay."""
    from dts.facet import adjacency_matrix

    return adjacency_matrix(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), FACET_FILTERS,
        key="bq_id",
    )


def _q_date_histogram_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram min_doc_count=0 densification (dts.facet.
    densify_date_histogram — closes the observed-buckets-only delta):
    every weekly bucket between the first and last observed, zero-filled."""
    from dts.facet import densify_date_histogram, facet_date_histogram

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return densify_date_histogram(
        facet_date_histogram(None, ev, "ts", "week"), "week"
    )


GEO_LAT = "(doc_id * 37 % 17000) / 100.0e0 - 85.0e0"
GEO_LON = "(doc_id * 73 % 36000) / 100.0e0 - 180.0e0"


def _geo_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(GEO_LAT).alias("lat"),
        F.expr(GEO_LON).alias("lon"),
    )


def _q_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounding_box filter (dts.geo.geo_bounding_box_docs): pure
    comparisons over doc-value coordinates (synthetic deterministic
    lat/lon from doc_id — identical expression in the oracle), pushed to
    the scan."""
    from dts.geo import geo_bounding_box_docs

    return geo_bounding_box_docs(
        _geo_docs(spark, sf_dir), "lat", "lon",
        top=30.0, left=-60.0, bottom=-30.0, right=60.0,
    )


def _q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance filter + sort (dts.geo.geo_distance_topk): the 15
    nearest docs to (10, 20) within 3,000 km by haversine — distances at
    3 dp (millimeters; above libm drift, below any ranking gap)."""
    from dts.geo import geo_distance_topk

    return geo_distance_topk(
        _geo_docs(spark, sf_dir), "lat", "lon",
        origin_lat=10.0, origin_lon=20.0, k=15, radius_m=3_000_000.0,
    )


NESTED_PRED = "_e.l_quantity >= 45 AND _e.l_linenumber <= 2"


def _q_nested_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested query (dts.joinquery.nested_match): orders carrying an
    items array<struct> (built from lineitem) where SOME element has
    quantity ≥ 45 AND linenumber ≤ 2 — the SAME-element constraint the
    flattened mapping can't express — scored by the max matching
    element's quantity. Pure array expressions, no explode."""
    from dts.joinquery import nested_match

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("l_linenumber", "l_quantity")
                )
            ).alias("items")
        )
    )
    out = nested_match(
        docs, "items", NESTED_PRED,
        score_expr_sql="_e.l_quantity", score_mode="max",
    )
    return out.select(
        "o_orderkey", F.round("_score", 6).alias("nested_score")
    )


def _q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms aggregation (dts.facet.rare_terms): long-tail source
    values with doc_count ≤ 2 over each boolean query's matches — exact
    set semantics (ES's CuckooFilter approximation is a documented
    delta)."""
    from dts.facet import rare_terms

    return rare_terms(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), "source",
        max_doc_count=2, key="bq_id",
    )


def _q_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms aggregation (dts.facet.multi_terms): compound
    (lang, source) buckets with cross-field doc_count over each boolean
    query's matches."""
    from dts.facet import multi_terms

    return multi_terms(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir),
        ["lang", "source"], key="bq_id",
    )


def _q_facet_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles aggregation (dts.facet.facet_percentiles, exact
    linear-interpolation path; percentile_approx t-digest at scale)."""
    from dts.facet import facet_percentiles

    return facet_percentiles(
        _bool_matches(spark, sf_dir), _docs(spark, sf_dir), "n_chars",
        key="bq_id",
    )


UPSERT_KEYS = (3, 7)
UPSERT_TEXT = "fast join table scan replaces the old {k} body with query data"


def _q_upsert_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document update lifecycle (dts.update.upsert_docs — Lucene
    updateDocument): two docs replaced by external key (tombstone +
    merge with fresh watermark ids), compacted, then BM25 top-10 — the
    oracle scores the post-update corpus directly (old rows gone, new
    rows at ids 500/501)."""
    import tempfile

    from dts.index_build import build_index, compact_index
    from dts.io import driver_documents_as_source
    from dts.score_index import bm25_topk_indexed
    from dts.update import upsert_docs

    docs = driver_documents_as_source(spark, sf_dir).withColumn(
        "key", F.concat(F.lit("k"), F.col("doc_id").cast("string"))
    )
    idx_dir = tempfile.mkdtemp(prefix="dts_upsert_idx_")
    build_index(spark, docs, idx_dir, bucket_size=256, store_fields=["key"])
    new = spark.createDataFrame(
        [
            (f"k{k}", f"k{k}", UPSERT_TEXT.format(k=f"k{k}"))
            for k in UPSERT_KEYS
        ],
        "path string, key string, content string",
    )
    upsert_docs(spark, idx_dir, new, "key")
    compact_index(spark, idx_dir)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(bm25_topk_indexed(spark, idx_dir, q, k=10**6))


_ANA_IDX_CACHE: dict[str, str] = {}


def _ana_index(spark: SparkSession, sf_dir: str) -> str:
    """Index over the ANALYZED corpus (dts.analysis.en_light_analyze_col:
    stopword removal + Lucene EnglishMinimalStemmer) — the analyzer
    composes outside the engine, so one standard build over analyzed
    text is the analyzed index."""
    if sf_dir not in _ANA_IDX_CACHE:
        import tempfile

        from dts.analysis import en_light_analyze_col
        from dts.index_build import build_index
        from dts.io import driver_documents_as_source

        docs = driver_documents_as_source(spark, sf_dir).withColumn(
            "content", en_light_analyze_col("content")
        )
        idx_dir = tempfile.mkdtemp(prefix="dts_ana_idx_")
        build_index(spark, docs, idx_dir, bucket_size=256)
        _ANA_IDX_CACHE[sf_dir] = idx_dir
    return _ANA_IDX_CACHE[sf_dir]


def _q_stemmed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the analyzed index with analyzer-mirrored queries —
    Lucene's index-time == query-time Analyzer contract: 'the databases'
    and 'database' hit the same postings."""
    from dts.analysis import en_light_analyze
    from dts.score_index import bm25_topk_indexed

    q = spark.createDataFrame(
        [(i, en_light_analyze(t), 0) for i, t in PROBE_QUERIES],
        "query_id long, text string, fuzzy_k int",
    )
    return _rerank6_top10(
        bm25_topk_indexed(spark, _ana_index(spark, sf_dir), q, k=10**6)
    )


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (dts.textstats.pii_scrub): email/IPv4/phone redaction +
    per-family counts, 100% JVM regexp in one map-side pass. The probe
    plants deterministic PII derived from doc_id into every doc (the
    synthetic corpus has none) and both engines scrub the same augmented
    text; the redacted text is md5-compared."""
    from dts.textstats import pii_scrub

    aug = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call +1 555-000-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
    out = pii_scrub(docs)
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_md5"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
    )


# Gopher-quality probe text: plant bullet lines (' row ' → newline + '- '),
# symbol runs (' merge ' → ' ### '), and a trailing ellipsis.
GQ_TEXT = (
    "concat(replace(replace(coalesce(text, ''), ' row ', "
    "concat({CHR}, '- ')), ' merge ', ' ### '), '...')"
)


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher NON-repetition quality rules (dts.textstats.gopher_quality
    — Rae et al. Table A1 completing gopher_repetition): word counts,
    mean word length, symbol-to-word ratio, bullet/ellipsis line
    fractions, alpha-word fraction, stop-word count, and the ANDed
    ``passes`` verdict. Integer counts + single divisions, one codegen
    pass."""
    from dts.textstats import gopher_quality

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.expr(GQ_TEXT.format(CHR="char(10)")).alias("text")
    )
    return gopher_quality(docs)


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (dts.lmscore.doc_lm_perplexity):
    per-doc bigram Stupid-Backoff log-prob and perplexity, LM = the
    corpus itself (self-perplexity — the contamination/outlier signal;
    cross-corpus LM is the same call with other frames). The many-addend
    float sum is a LEFT FOLD over position-sorted lps on both engines
    (Spark aggregate ≡ DuckDB list_reduce), which is what makes a
    whole-document float reduction hash-comparable."""
    from dts.lmscore import doc_lm_perplexity, unigram_counts
    from dts.phrasesuggest import bigram_counts

    docs = _docs(spark, sf_dir)
    return doc_lm_perplexity(
        docs, bigram_counts(docs), unigram_counts(docs)
    )


def _q_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (dts.textstats.gopher_repetition, Rae et
    al. 2021 Table A1): dup line/paragraph fractions, top-n-gram and
    dup-n-gram character fractions — one map-side codegen pass. The
    synthetic corpus has no newlines, so the probe plants them
    deterministically in BOTH engines (' table ' → \\n, ' row ' → \\n\\n)
    to make the line/paragraph stats non-degenerate."""
    from dts.textstats import gopher_repetition

    aug = F.replace(
        F.replace(
            F.coalesce(F.col("text"), F.lit("")), F.lit(" table "), F.lit("\n")
        ),
        F.lit(" row "),
        F.lit("\n\n"),
    )
    docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
    return gopher_repetition(docs)


def _q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL (dts.dedup.remove_duplicate_ngrams —
    Lee et al. deduplicate-text-datasets, the stage after pair
    detection): every token covered by a corpus-duplicated 6-gram is cut
    and the doc rebuilt from survivors; md5 of the cleaned token stream
    plus removal counts are compared. The sf0.01 corpus has 1061
    duplicated 6-grams (2195 occurrences), so the removal is
    non-degenerate."""
    from dts.dedup import remove_duplicate_ngrams

    out = remove_duplicate_ngrams(_docs(spark, sf_dir), k=6, min_count=2)
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_md5"),
        "n_tokens",
        "n_removed",
    )


CONTAM_BENCH_IDS = (3, 17, 41)


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (dts.dedup.contamination_pairs): corpus
    docs sharing ≥2 distinct token 6-grams with an eval document. The
    bench set is synthesized deterministically from the corpus itself —
    the first 60 tokens of three fixed docs — so the leak is planted and
    the oracle replays it exactly. One broadcast join + hash agg; the
    corpus never shuffles."""
    from dts.dedup import contamination_pairs

    docs = _docs(spark, sf_dir)
    bt = F.expr(
        f"array_join(slice(regexp_extract_all(lower(coalesce(text, '')),"
        f" '{TOK}', 0), 1, 60), ' ')"
    )
    bench = docs.filter(F.col("doc_id").isin(list(CONTAM_BENCH_IDS))).select(
        F.col("doc_id").alias("bench_id"), bt.alias("text")
    )
    return contamination_pairs(docs, bench, n=6, min_shared=2)


def _q_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing shared-span pairs (dts.dedup.winnowed_span_pairs, MOSS /
    Lee-et-al exact-substring dedup): doc pairs sharing a winnowed token
    6-gram fingerprint — guaranteed to catch any verbatim run ≥ 9 tokens
    while sampling ~1/2.5 of the grams."""
    from dts.dedup import winnowed_span_pairs

    return winnowed_span_pairs(_docs(spark, sf_dir), k=6, w=4)


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: jaccard pairs (unigram shingles, ≥0.5)
    composed with iterative min-label connected components (dts.cluster).
    Oracle: recursive CTE computing each node's minimum reachable id."""
    from dts.cluster import dup_clusters

    return dup_clusters(_docs(spark, sf_dir), n=1, threshold=0.5)


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.textstats import token_counts

    return token_counts(_docs(spark, sf_dir))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.textstats import quality_scores

    return quality_scores(_docs(spark, sf_dir))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir), k=4, n=3)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full exact oracle: the bitwise majority vote IS SQL-expressible —
    the DuckDB side rebuilds each bit from `md5_number_upper` token hashes
    (LE-u64 of the first 8 md5 bytes, identical to the engine's md5→conv
    derivation) and hash-matches the 64-bit fingerprints."""
    from dts.dedup import simhash_fingerprints

    return simhash_fingerprints(_docs(spark, sf_dir))


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    return cosine_topk_bruteforce(emb, queries, k=10)


def _q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered kNN (ES pre-filter semantics): exact top-10 among ONLY
    the eligible vectors (vec_id ≡ 0 mod 3) — the filter semi-joins the
    corpus before ranking, so the page is full-length from the allowed
    set, never a post-filtered stub."""
    from dts.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    allow = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    return cosine_topk_bruteforce(emb, queries, k=10, allow=allow)


HYBRID_RRF_K = 60


def _q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8 hybrid search: BM25 leg + exact-cosine kNN leg fused with
    reciprocal rank fusion 1/(rrf_k + rank) (dts.hybrid, rrf_k=60, the
    ES rank_constant default). Legs are FULL ranked lists re-ranked at
    6 dp (no window cut — cut-boundary 7th-decimal ties are
    engine-dependent; the fusion math is the surface under test). The
    driver's doc_id and vec_id share an id space by construction."""
    from dts.hybrid import hybrid_topk

    idx_dir = _pos_index(spark, sf_dir)
    q = spark.createDataFrame(
        [(i, t, 0) for i, t in PROBE_QUERIES[:5]],
        "query_id long, text string, fuzzy_k int",
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvecs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    return hybrid_topk(
        spark, idx_dir, q, emb, qvecs, k=10, window=10**6,
        rrf_k=HYBRID_RRF_K, rank_round=6,
    )


SQ_RERANK = 30


def _q_sq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized vector search (dts.similarity.sq_topk —
    Lucene int8 / FAISS SQ8 shape): rank by quantized cosine over the
    4×-smaller representation (per-vector scales cancel for cosine),
    exact-rescore the top 30, emit top-10. Oracle replicates the
    quantization (floor(x/scale + 0.5)) and both stages bit-for-bit."""
    from dts.similarity import sq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    return sq_topk(emb, queries, k=10, rerank=SQ_RERANK)


IVF_CENTROIDS, IVF_NPROBE, IVF_SEED = 16, 4, "ivf"


PQ_M = 16
PQ_KSUB = 16
PQ_SEED = "pqprobe"
PQ_RERANK = 40


def _pq_fold(m: int, init: str | None = None) -> str:
    """Left-associated ADC sum ((p0 + p1) + p2) + … — the exact fold
    order the engine's numpy loop uses, so both engines add the SAME
    round6 doubles in the SAME order. With ``init`` the fold seeds from
    that column (the residual variant's per-(query, cell) offset:
    ((init + p0) + p1) + …)."""
    expr = init if init is not None else "p0"
    for j in range((0 if init is not None else 1), m):
        expr = f"({expr} + p{j})"
    return expr


def _q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (dts.similarity.pq_train/pq_encode/
    pq_topk — FAISS IndexPQ + rescore): deterministic md5-sampled
    codebooks over normalized subvectors (iters=0, the oracle-exact
    init), ADC ranking from round6 LUT gathers (left-fold sum), exact
    cosine re-rank of the top rerank survivors. The oracle recomputes the
    whole chain — init, code assignment, LUT, left-assoc ADC sum, rescore
    — relationally."""
    from dts.similarity import pq_encode, pq_topk, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    cb = pq_train(emb, m=PQ_M, ksub=PQ_KSUB, seed=PQ_SEED)
    return pq_topk(pq_encode(emb, cb), q, cb, k=10, rerank=PQ_RERANK)


IVFPQ_CENTS = 16
IVFPQ_NPROBE = 4
IVFPQ_SEED = "ivfpqc"


def _q_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition (dts.similarity.ivfpq_topk — FAISS IndexIVFPQ,
    by_residual=False): md5-sampled coarse cells prune the scan, shared
    PQ codebooks compress it, ADC ranks inside the probed cells, exact
    rescore finishes. The oracle composes the (already pinned) IVF assign
    + probe CTEs with the PQ code/LUT/ADC chain."""
    from dts.similarity import ivfpq_topk, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    cb = pq_train(emb, m=PQ_M, ksub=PQ_KSUB, seed=PQ_SEED)
    return ivfpq_topk(
        emb, q, cb, n_centroids=IVFPQ_CENTS, nprobe=IVFPQ_NPROBE,
        k=10, rerank=PQ_RERANK, seed=IVFPQ_SEED,
    )


RPQ_SEED = "rpqprobe"


def _q_rpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL IVF-PQ (dts.similarity.rpq_topk — FAISS IndexIVFPQ
    by_residual=True, the FAISS default; closes ivfpq's documented
    delta): PQ codes quantize x̂ − ĉ(cell); ADC decomposes exactly as
    ⟨q̂,ĉ⟩ + ⟨q̂,r⟩, so the scan keeps ONE per-query residual LUT plus a
    per-(query, probed-cell) scalar offset on the broadcast probes table.
    The oracle recomputes residual codebooks/codes/LUT/offset in SQL."""
    from dts.similarity import (
        _as_double, _ivf_centroids, pq_train_residual, rpq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e0 = emb.select("vec_id", _as_double("embedding").alias("v"))
    rows = _ivf_centroids(e0, IVFPQ_CENTS, IVFPQ_SEED).collect()
    import numpy as np

    cids = np.array([r["c_id"] for r in rows], dtype="int64")
    cmat = np.array([r["c"] for r in rows], dtype="float64")
    rcb = pq_train_residual(
        emb, cids, cmat, m=PQ_M, ksub=PQ_KSUB, seed=RPQ_SEED
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    return rpq_topk(
        emb, q, rcb, nprobe=IVFPQ_NPROBE, k=10, rerank=PQ_RERANK,
        cents=(cids, cmat),
    )


def _q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 IVF ANN (dts.similarity.ivf_topk): deterministic
    md5-sampled centroids (engine-portable — the oracle recomputes the
    same subset), nearest-cell assignment, nprobe nearest cells per
    query, exact cosine re-rank inside probed cells."""
    from dts.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    return ivf_topk(
        emb, queries, k=10, n_centroids=IVF_CENTROIDS, nprobe=IVF_NPROBE,
        seed=IVF_SEED,
    )


IVF_DUP_SEED = "ivfdup"


def _q_emb_ivf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 IVF-bucketed embedding near-dup pairs
    (dts.dedup.embedding_dup_pairs_ivf): top-20 same-cell cosine pairs —
    the Σ|cell|² scale path replacing the n² cross join; assignment is
    the zero-shuffle map-side argmax whose spec the oracle recomputes
    (md5-sampled centroids, round-6 half-away cosine, smallest-c_id
    ties)."""
    from dts.dedup import embedding_dup_pairs_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_dup_pairs_ivf(
        emb, tau=-1.0, n_centroids=IVF_CENTROIDS, seed=IVF_DUP_SEED
    )
    return pairs.orderBy(F.col("cos6").desc(), "a", "b").limit(20)


def _q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with md5-derived hyperplanes (dts.similarity.md5_hyperplanes)
    — the plane matrix is a pure function of md5, so the DuckDB oracle
    recomputes the SAME planes via md5_number_upper and replicates bucket
    assignment + Hamming-1 multiprobe + exact cosine re-rank bit-for-bit."""
    from dts.similarity import lsh_topk, md5_hyperplanes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qvec"),
    )
    dim = len(emb.select("embedding").first()["embedding"])
    return lsh_topk(
        emb, queries, k=10, n_bits=8, planes=md5_hyperplanes(dim, 8)
    )


def _q_emb_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dts.dedup import embedding_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        embedding_dup_pairs(emb, tau=-1.0)
        .orderBy(F.col("cos6").desc(), "a", "b")
        .limit(20)
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
    ).agg(
        F.count("*").alias("n"),
        (
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4).cast("double")
        ).alias("sum_value4"),
    )


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic join/agg coverage (O13/O21 analogue over TPC-H-ish tables);
    DECIMAL arithmetic so both engines sum exactly."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1.0).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue2"),
            F.count("*").alias("n_items"),
        )
    )


def _q_doc_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mandated per-row invariant (BASELINE.json input_hint): sha256
    over content bytes, computed JVM-side (F.sha2), oracle-checked."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("sha")
    )


def _q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) via built-in session_window —
    oracle reproduces it with lag+cumsum in DuckDB."""
    from dts.streaming import session_windows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_windows(ev, gap="30 minutes")


def _q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation → total) over the TPC-H-ish join; DECIMAL-exact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1.0).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .rollup("n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue2"))
        .select(F.coalesce("n_name", F.lit("ALL")).alias("n_name"), "revenue2")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # reference-derived operators (SURVEY.md §2)
        "term_df": _q_term_df,
        "term_tf_total": _q_term_tf_total,
        "doc_len": _q_doc_len,
        "bm25_topk": _q_bm25_topk,
        "bm25_scores": _q_bm25_scores,
        "fuzzy_expand": _q_fuzzy_expand,
        "fuzzy_match_count": _q_fuzzy_match_count,
        "byte_match_count": _q_byte_match_count,
        "byte_match_binary": _q_byte_match_binary,
        "bm25_topk_engine": _q_bm25_topk_engine,
        "search_after": _q_search_after,
        "fuzzy_expand_engine": _q_fuzzy_expand_engine,
        "phrase_match": _q_phrase_match,
        "phrase_slop": _q_phrase_slop,
        "proximity_match": _q_proximity_match,
        "span_first": _q_span_first,
        "span_near": _q_span_near,
        "intervals": _q_intervals,
        "span_not": _q_span_not,
        "phrase_prefix": _q_phrase_prefix,
        "synonym_topk": _q_synonym_topk,
        "function_score": _q_function_score,
        "facet_histogram": _q_facet_histogram,
        "multi_index": _q_multi_index,
        "rescore": _q_rescore,
        "explain": _q_explain,
        "term_range": _q_term_range,
        "percolate": _q_percolate,
        "boolean_match": _q_boolean_match,
        "boolean_should": _q_boolean_should,
        "search_query": _q_search_query,
        "bool_tree_topk": _q_bool_tree,
        "more_like_this": _q_more_like_this,
        "suggest": _q_suggest,
        "complete": _q_complete,
        "wildcard_count": _q_wildcard_count,
        "regex_count": _q_regex_count,
        "sample_docs": _q_sample_docs,
        "dedup_keep": _q_dedup_keep,
        "wildcard_topk": _q_wildcard_topk,
        "wildcard_docs": _q_wildcard_docs,
        "bm25_topk_tombstone": _q_bm25_topk_tombstone,
        "bm25_topk_filtered": _q_bm25_topk_filtered,
        "bm25_topk_deleted": _q_bm25_topk_deleted,
        "snippet": _q_snippet,
        "search_snippets": _q_search_snippets,
        "bm25_topk_and": _q_bm25_topk_and,
        "facet_lang": _q_facet_lang,
        "facet_lang_sidecar": _q_facet_lang_sidecar,
        "sig_terms": _q_sig_terms,
        "top_hits": _q_top_hits,
        "term_vectors": _q_term_vectors,
        "lmd_topk": _q_lmd_topk,
        "facet_stats": _q_facet_stats,
        "facet_range": _q_facet_range,
        "composite_page2": _q_composite_page2,
        "facet_date_histogram": _q_facet_date_histogram,
        "pipeline_aggs": _q_pipeline_aggs,
        "facet_filters": _q_facet_filters,
        "facet_cardinality": _q_facet_cardinality,
        "rare_terms": _q_rare_terms,
        "adjacency_matrix": _q_adjacency_matrix,
        "percentile_ranks": _q_percentile_ranks,
        "date_histogram_dense": _q_date_histogram_dense,
        "multi_terms": _q_multi_terms,
        "has_child": _q_has_child,
        "blocklist": _q_blocklist,
        "dedup_paragraphs": _q_dedup_paragraphs,
        "match_bool_prefix": _q_match_bool_prefix,
        "weighted_avg": _q_weighted_avg,
        "bucket_extrema": _q_bucket_extrema,
        "has_parent": _q_has_parent,
        "nested_match": _q_nested_match,
        "geo_bbox": _q_geo_bbox,
        "geo_distance": _q_geo_distance,
        "facet_percentiles": _q_facet_percentiles,
        "pii_scrub": _q_pii_scrub,
        "gopher_repetition": _q_gopher,
        "lm_perplexity": _q_lm_perplexity,
        "gopher_quality": _q_gopher_quality,
        "dedup_spans": _q_dedup_spans,
        "stemmed_topk": _q_stemmed_topk,
        "upsert_topk": _q_upsert_topk,
        "decay_topk": _q_decay_topk,
        "rank_feature": _q_rank_feature,
        "script_score": _q_script_score,
        "phrase_suggest": _q_phrase_suggest,
        "dv_update_range": _q_dv_update_range,
        "range_search": _q_range_search,
        "terms_set": _q_terms_set,
        "sort_by_meta": _q_sort_by_meta,
        "sorted_fetch": _q_sorted_fetch,
        "collapse_source": _q_collapse_source,
        "tfidf_topk": _q_tfidf_topk,
        "search_boosted": _q_search_boosted,
        "dup_clusters": _q_dup_clusters,
        "multifield_topk": _q_multifield_topk,
        "dismax_topk": _q_dismax_topk,
        "cross_fields": _q_cross_fields,
        "combined_fields": _q_combined_fields,
        "search_fields": _q_search_fields,
        "phrase_scored": _q_phrase_scored,
        # training-data pipeline operators
        "exact_dup": _q_exact_dup,
        "minhash_bands": _q_minhash_bands,
        "jaccard_pairs": _q_jaccard_pairs,
        "contamination": _q_contamination,
        "span_pairs": _q_span_pairs,
        "token_stats": _q_token_stats,
        "quality": _q_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "simhash": _q_simhash,
        "ann_topk": _q_ann_topk,
        "ann_filtered": _q_ann_filtered,
        "rrf_hybrid": _q_rrf_hybrid,
        "sq_ann_topk": _q_sq_ann_topk,
        "ivf_ann_topk": _q_ivf_ann_topk,
        "pq_ann_topk": _q_pq_ann_topk,
        "ivfpq_ann_topk": _q_ivfpq_ann_topk,
        "rpq_ann_topk": _q_rpq_ann_topk,
        "emb_ivf_pairs": _q_emb_ivf_pairs,
        "lsh_ann_topk": _q_lsh_ann_topk,
        "emb_top_pairs": _q_emb_top_pairs,
        # generic relational coverage
        "events_hourly": _q_events_hourly,
        "revenue_by_nation": _q_revenue_by_nation,
        "user_sessions": _q_user_sessions,
        "revenue_rollup": _q_revenue_rollup,
        "doc_sha256": _q_doc_sha256,
    }


_D_TOKS = f"regexp_extract_all(lower(coalesce(text, '')), '{TOK}')"
_LM_ALPHA = 0.4  # == dts.phrasesuggest.ALPHA (Stupid Backoff discount)
_D_SH3 = f"""
    CASE WHEN len({_D_TOKS}) < 3 THEN [array_to_string({_D_TOKS}, ' ')]
    ELSE list_distinct(list_transform(range(0, len({_D_TOKS}) - 2),
         i -> array_to_string(list_slice({_D_TOKS}, (i + 1)::INTEGER, (i + 3)::INTEGER), ' ')))
    END
"""
_D_TRI = """
    CASE WHEN length({c}) < 3 THEN [{c}]
    ELSE list_distinct(list_transform(range(1, length({c}) - 1),
         i -> substring({c}, i::INTEGER, 3)))
    END
"""
_D_COS = (
    "round(list_dot_product(v, w) / "
    "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(w, w))), 6)"
)
_STOPLIST = "['the','and','is','of','to','in','that','it']"


def _span_not_sql() -> str:
    """SpanNot replay: per start p, the greedy (minimal) next position
    via list_min, the total-span budget, then an emptiness check of the
    exclude term over [p − pre, end + post] (1-based, doc-clamped)."""
    parts = []
    for sq, inc, ex, slop, pre, post in SPAN_NOT_QS:
        terms = inc.split()
        if len(terms) == 1:
            cond = (
                f"toks[p] = '{terms[0]}' AND len(list_filter("
                f"range(greatest(1, p - {pre}), least(len(toks), p + {post}) + 1), "
                f"k -> toks[k] = '{ex}')) = 0"
            )
        else:
            t0, t1 = terms
            jm = (
                f"list_min(list_filter(range(p + 1, len(toks) + 1), "
                f"q -> toks[q] = '{t1}'))"
            )
            cond = (
                f"toks[p] = '{t0}' AND {jm} IS NOT NULL AND {jm} - p <= {1 + slop} "
                f"AND len(list_filter("
                f"range(greatest(1, p - {pre}), least(len(toks), {jm} + {post}) + 1), "
                f"k -> toks[k] = '{ex}')) = 0"
            )
        parts.append(f"""
SELECT {sq}::BIGINT AS sq_id, doc_id,
       len(list_filter(range(1, len(toks) + 1), p -> {cond}))::BIGINT AS n_matches
FROM t""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
SELECT sq_id, doc_id, n_matches FROM ({body}) WHERE n_matches > 0
"""


def _phrase_match_sql() -> str:
    """Token-array replay of the positional phrase probe: for each phrase,
    count start offsets j with toks[j+i] = term_i for all i (engine
    tokenizer == the [a-z0-9]+ regex on this table)."""
    parts = []
    for pid, text in PHRASE_QUERIES:
        terms = text.split(" ")
        m = len(terms)
        cond = " AND ".join(
            f"toks[j + {i}] = '{t}'" for i, t in enumerate(terms)
        )
        parts.append(f"""
SELECT {pid}::BIGINT AS phrase_id, doc_id,
       len(list_filter(range(1, len(toks) - {m} + 2), j -> {cond}))::BIGINT AS n_matches
FROM t WHERE len(toks) >= {m}""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
SELECT phrase_id, doc_id, n_matches FROM ({body}) WHERE n_matches > 0
"""


def _phrase_slop_sql() -> str:
    """Nested-lambda replay of the sloppy-phrase chain: a start j0 counts
    iff toks[j0] = t0 and, recursively, some j_{i+1} in
    (j_i, j_i + slop] carries t_{i+1}. Out-of-range list indexes are NULL
    in DuckDB, which fails the equality — no explicit bounds needed."""
    parts = []
    for pid, text, slop in SLOP_PHRASES:
        terms = text.split(" ")
        m = len(terms)
        expr = f"toks[j{m - 1}] = '{terms[-1]}'"
        for i in range(m - 2, -1, -1):
            expr = (
                f"toks[j{i}] = '{terms[i]}' AND len(list_filter("
                f"range(j{i} + 1, j{i} + {slop} + 1), j{i + 1} -> {expr})) > 0"
            )
        parts.append(f"""
SELECT {pid}::BIGINT AS phrase_id, doc_id,
       len(list_filter(range(1, len(toks) + 1), j0 -> {expr}))::BIGINT AS n_matches
FROM t""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
SELECT phrase_id, doc_id, n_matches FROM ({body}) WHERE n_matches > 0
"""


def oracle_sql() -> dict[str, str]:
    tok_cte = (
        f"WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '{TOK}')) AS term FROM documents)"
    )
    _lang_hits = {
        lang: f"len(list_filter({_D_TOKS}, t -> list_contains(["
        + ",".join(f"'{w}'" for w in ws)
        + "], t)))"
        for lang, ws in sorted(
            {
                "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
                "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
                "es": ["el", "la", "los", "las", "es", "y", "de", "que"],
                "fr": ["le", "la", "les", "et", "est", "que", "des", "une"],
            }.items()
        )
    }
    extra = {
        "bm25_topk_engine": None,  # same oracle as bm25_topk (set below)
        "fuzzy_expand_engine": f"""
WITH tok AS (SELECT unnest({_D_TOKS}) AS term FROM documents),
vocab AS (SELECT DISTINCT term FROM tok),
fz(fq_id, qterm, k) AS (VALUES {", ".join(f"({i}, '{t}', 2)" for i, t in FUZZY_TERMS)}),
vt AS (SELECT term, {_D_TRI.format(c="term")} AS tri FROM vocab),
qt AS (SELECT fq_id::BIGINT AS fq_id, qterm, k, {_D_TRI.format(c="qterm")} AS tri FROM fz)
SELECT fq_id, term
FROM vt CROSS JOIN qt
WHERE len(list_intersect(vt.tri, qt.tri)) >= greatest(1, len(qt.tri) - 3 * k)
  AND abs(length(term) - length(qterm)) <= k
  AND levenshtein(qterm, term) <= k
""",
        "exact_dup": """
SELECT doc_id, md5(coalesce(text, '')) AS content_md5,
       min(doc_id) OVER (PARTITION BY md5(coalesce(text, ''))) AS canonical_id
FROM documents
""",
        "minhash_bands": f"""
WITH sigs AS (
  SELECT doc_id,
         list_transform(range(0, 8),
            i -> list_min(list_transform({_D_SH3}, s -> md5(i::VARCHAR || ':' || s)))) AS sig
  FROM documents
)
SELECT doc_id, band::INTEGER AS band,
       array_to_string(list_slice(sig, (band * 4 + 1)::INTEGER, (band * 4 + 4)::INTEGER), '|') AS key
FROM sigs CROSS JOIN (SELECT unnest(range(0, 2)) AS band)
""",
        "jaccard_pairs": f"""
WITH sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len({_D_TOKS}) < 1 THEN [array_to_string({_D_TOKS}, ' ')]
         ELSE list_distinct({_D_TOKS}) END) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS shared
  FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id GROUP BY 1, 2
)
SELECT a, b, round(shared / (sa.n_sh + sb.n_sh - shared), 6) AS jac6
FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id JOIN sizes sb ON pairs.b = sb.doc_id
WHERE round(shared / (sa.n_sh + sb.n_sh - shared), 6) >= 0.3
""",
        "span_pairs": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(0, len(toks) - 5),
           i -> md5(array_to_string(
                  list_slice(toks, (i + 1)::INTEGER, (i + 6)::INTEGER), ' ')))
           AS grams,
         toks
  FROM t
),
fp AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) < 6 THEN [md5(array_to_string(toks, ' '))]
    ELSE list_distinct(list_transform(
           range(1, greatest(len(grams) - 4 + 1, 1) + 1),
           j -> list_min(list_slice(grams, j::INTEGER, (j + 3)::INTEGER))))
    END) AS fp
  FROM g
)
SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS n_shared
FROM fp x JOIN fp y USING (fp)
WHERE x.doc_id < y.doc_id
GROUP BY 1, 2
""",
        "contamination": f"""
WITH b AS (
  SELECT doc_id AS bench_id,
         array_to_string(list_slice({_D_TOKS}, 1, 60), ' ') AS btext
  FROM documents WHERE doc_id IN (3, 17, 41)
),
btoks AS (
  SELECT bench_id,
         regexp_extract_all(lower(coalesce(btext, '')), '{TOK}') AS toks
  FROM b
),
bsh AS (
  SELECT bench_id, unnest(
    CASE WHEN len(toks) < 6 THEN [array_to_string(toks, ' ')]
    ELSE list_distinct(list_transform(range(0, len(toks) - 5),
         i -> array_to_string(list_slice(toks, (i + 1)::INTEGER, (i + 6)::INTEGER), ' ')))
    END) AS shingle
  FROM btoks
),
dsh AS (
  SELECT doc_id, unnest(
    CASE WHEN len({_D_TOKS}) < 6 THEN [array_to_string({_D_TOKS}, ' ')]
    ELSE list_distinct(list_transform(range(0, len({_D_TOKS}) - 5),
         i -> array_to_string(list_slice({_D_TOKS}, (i + 1)::INTEGER, (i + 6)::INTEGER), ' ')))
    END) AS shingle
  FROM documents
)
SELECT dsh.doc_id, bsh.bench_id, count(*)::BIGINT AS n_shared
FROM dsh JOIN bsh USING (shingle)
GROUP BY 1, 2
HAVING count(*) >= 2
""",
        "token_stats": f"""
SELECT doc_id,
       len({_D_TOKS})::BIGINT AS n_tokens,
       len(list_distinct({_D_TOKS}))::BIGINT AS n_distinct,
       coalesce(list_sum(list_transform({_D_TOKS}, t -> ceil(length(t) / 4.0)::BIGINT)), 0)::BIGINT AS n_subword
FROM documents
""",
        "quality": f"""
SELECT doc_id,
       length(coalesce(text, ''))::BIGINT AS n_chars_c,
       round(length(regexp_replace(lower(coalesce(text, '')), '[^a-z]', '', 'g'))
             / greatest(length(coalesce(text, '')), 1), 6) AS alpha_ratio6,
       round(len(list_filter({_D_TOKS}, t -> list_contains({_STOPLIST}, t)))
             / greatest(len({_D_TOKS}), 1), 6) AS stop_ratio6,
       round(coalesce(list_sum(list_transform({_D_TOKS}, t -> length(t))), 0)
             / greatest(len({_D_TOKS}), 1), 6) AS mean_tok_len6,
       round(0.4 * (length(regexp_replace(lower(coalesce(text, '')), '[^a-z]', '', 'g'))
                    / greatest(length(coalesce(text, '')), 1))
             + 0.4 * (len(list_filter({_D_TOKS}, t -> list_contains({_STOPLIST}, t)))
                      / greatest(len({_D_TOKS}), 1))
             + 0.2 * least(1.0, len({_D_TOKS}) / 64.0), 6) AS quality6
FROM documents
""",
        "lang_id": f"""
WITH h AS (
  SELECT doc_id, {_lang_hits['de']} AS h_de, {_lang_hits['en']} AS h_en,
         {_lang_hits['es']} AS h_es, {_lang_hits['fr']} AS h_fr
  FROM documents
)
SELECT doc_id, CASE
  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
  WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
  WHEN h_es >= h_fr THEN 'es'
  ELSE 'fr' END AS pred_lang
FROM h
""",
        "fingerprint": f"""
SELECT doc_id,
       array_to_string(list_slice(list_sort(list_transform({_D_SH3}, s -> md5(s))), 1, 4), '|') AS fp
FROM documents
""",
        "ann_topk": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS w FROM e WHERE vec_id < 5),
s AS (SELECT q_id, vec_id, {_D_COS} AS cos6 FROM e CROSS JOIN q)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",
        "sq_ann_topk": f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
enc AS (
  SELECT vec_id, v,
         list_transform(v, x -> floor(x /
           greatest(list_max(list_transform(v, y -> abs(y))) / 127.0, 1e-30)
           + 0.5)) AS qv
  FROM e0
),
encn AS (
  SELECT vec_id, v, qv, sqrt(list_dot_product(qv, qv)) AS qn FROM enc
),
q AS (
  SELECT vec_id AS q_id, v AS w, qv AS qw, qn AS qwn
  FROM encn WHERE vec_id < 5
),
cand AS (
  SELECT q_id, e.vec_id, e.v, q.w,
         round(list_dot_product(e.qv, q.qw) / (e.qn * q.qwn), 6) AS qcos6
  FROM encn e CROSS JOIN q
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY q_id ORDER BY qcos6 DESC, vec_id ASC) AS r
    FROM cand
  ) WHERE r <= {SQ_RERANK}
),
s AS (SELECT q_id, vec_id, {_D_COS} AS cos6 FROM top)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",
        "ann_filtered": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS w FROM e WHERE vec_id < 5),
s AS (
  SELECT q_id, vec_id, {_D_COS} AS cos6
  FROM e CROSS JOIN q WHERE e.vec_id % 3 = 0
)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",
        "rrf_hybrid": _BM25_SQL_CTE + f""",
tl AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored WHERE query_id < 5
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT vec_id AS query_id, v AS w FROM e WHERE vec_id < 5),
vl AS (
  SELECT query_id, vec_id AS doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY {_D_COS} DESC, vec_id ASC) AS rank
  FROM e CROSS JOIN qv
),
u AS (
  SELECT query_id, doc_id,
         (1.0::DOUBLE) / ({HYBRID_RRF_K}::DOUBLE + rank::DOUBLE) AS contrib
  FROM tl
  UNION ALL
  SELECT query_id, doc_id,
         (1.0::DOUBLE) / ({HYBRID_RRF_K}::DOUBLE + rank::DOUBLE) AS contrib
  FROM vl
),
fused AS (
  SELECT query_id, doc_id, round(sum(contrib), 6) AS rrf6
  FROM u GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf6 DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= 10
""",
        "pq_ann_topk": f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (
  SELECT vec_id, v,
         list_transform(v, x -> x / greatest(sqrt(list_dot_product(v, v)), 1e-30)) AS nv
  FROM e0
),
samp AS (
  SELECT vec_id, nv, code FROM (
    SELECT vec_id, nv,
           row_number() OVER (ORDER BY md5('{PQ_SEED}' || vec_id::VARCHAR), vec_id) - 1 AS code
    FROM e
  ) WHERE code < {PQ_KSUB}
),
cb AS (
  SELECT j.j, s.code, s.nv[j.j*{64 // PQ_M}+1 : j.j*{64 // PQ_M}+{64 // PQ_M}] AS c
  FROM samp s, unnest(range(0, {PQ_M})) AS j(j)
),
sv AS (
  SELECT e.vec_id, j.j, e.nv[j.j*{64 // PQ_M}+1 : j.j*{64 // PQ_M}+{64 // PQ_M}] AS x
  FROM e, unnest(range(0, {PQ_M})) AS j(j)
),
dist AS (
  SELECT sv.vec_id, sv.j, cb.code,
         round(list_dot_product(sv.x, sv.x) - 2*list_dot_product(sv.x, cb.c)
               + list_dot_product(cb.c, cb.c), 6) AS d6
  FROM sv JOIN cb ON cb.j = sv.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d6 ASC, code ASC) AS r
    FROM dist
  ) WHERE r = 1
),
q AS (SELECT vec_id AS q_id, v, nv FROM e WHERE vec_id < 5),
lut AS (
  SELECT q.q_id, cb.j, cb.code,
         round(list_dot_product(q.nv[cb.j*{64 // PQ_M}+1 : cb.j*{64 // PQ_M}+{64 // PQ_M}], cb.c), 6) AS p6
  FROM q CROSS JOIN cb
),
adcp AS (
  SELECT c.vec_id, l.q_id, {", ".join(f"max(CASE WHEN c.j={j} THEN l.p6 END) AS p{j}" for j in range(PQ_M))}
  FROM codes c JOIN lut l ON l.j = c.j AND l.code = c.code
  GROUP BY c.vec_id, l.q_id
),
adc AS (
  SELECT vec_id, q_id,
         round({_pq_fold(PQ_M)}, 6) AS adc6
  FROM adcp
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc6 DESC, vec_id ASC) AS r
    FROM adc
  ) WHERE r <= {PQ_RERANK}
),
s AS (
  SELECT t.q_id, t.vec_id,
         round(list_dot_product(e.v, q.v) /
               (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos6
  FROM top t JOIN e ON e.vec_id = t.vec_id JOIN q ON q.q_id = t.q_id
)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",

        "rpq_ann_topk": f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (
  SELECT vec_id, v,
         list_transform(v, x -> x / greatest(sqrt(list_dot_product(v, v)), 1e-30)) AS nv
  FROM e0
),
cents AS (
  SELECT vec_id AS c_id, v AS c FROM e0
  ORDER BY md5('{IVFPQ_SEED}' || vec_id::VARCHAR), vec_id LIMIT {IVFPQ_CENTS}
),
ncents AS (
  SELECT c_id, list_transform(c, x -> x / sqrt(list_dot_product(c, c))) AS nc
  FROM cents
),
assign AS (
  SELECT vec_id, c_id FROM (
    SELECT e0.vec_id, c.c_id,
           row_number() OVER (PARTITION BY e0.vec_id
             ORDER BY round(list_dot_product(e0.v, c.c) /
                 (sqrt(list_dot_product(e0.v, e0.v)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM e0 CROSS JOIN cents c) WHERE r = 1
),
samp AS (
  SELECT vec_id, nv, code FROM (
    SELECT vec_id, nv,
           row_number() OVER (ORDER BY md5('{RPQ_SEED}' || vec_id::VARCHAR), vec_id) - 1 AS code
    FROM e
  ) WHERE code < {PQ_KSUB}
),
rs AS (
  SELECT s.code,
         list_transform(range(1, len(s.nv) + 1), i -> s.nv[i] - n.nc[i]) AS rv
  FROM samp s
  JOIN assign a ON a.vec_id = s.vec_id
  JOIN ncents n ON n.c_id = a.c_id
),
cb AS (
  SELECT j.j, rs.code, rs.rv[j.j*{64 // PQ_M}+1 : j.j*{64 // PQ_M}+{64 // PQ_M}] AS c
  FROM rs, unnest(range(0, {PQ_M})) AS j(j)
),
rv_all AS (
  SELECT e.vec_id,
         list_transform(range(1, len(e.nv) + 1), i -> e.nv[i] - n.nc[i]) AS rv
  FROM e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN ncents n ON n.c_id = a.c_id
),
sv AS (
  SELECT r.vec_id, j.j, r.rv[j.j*{64 // PQ_M}+1 : j.j*{64 // PQ_M}+{64 // PQ_M}] AS x
  FROM rv_all r, unnest(range(0, {PQ_M})) AS j(j)
),
dist AS (
  SELECT sv.vec_id, sv.j, cb.code,
         round(list_dot_product(sv.x, sv.x) - 2*list_dot_product(sv.x, cb.c)
               + list_dot_product(cb.c, cb.c), 6) AS d6
  FROM sv JOIN cb ON cb.j = sv.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d6 ASC, code ASC) AS r
    FROM dist
  ) WHERE r = 1
),
q AS (SELECT vec_id AS q_id, v, nv FROM e WHERE vec_id < 5),
probes AS (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round(list_dot_product(q.v, c.c) /
                 (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM q CROSS JOIN cents c) WHERE r <= {IVFPQ_NPROBE}
),
qoff AS (
  SELECT q.q_id, n.c_id, round(list_dot_product(q.nv, n.nc), 6) AS qc6
  FROM q CROSS JOIN ncents n
),
lut AS (
  SELECT q.q_id, cb.j, cb.code,
         round(list_dot_product(q.nv[cb.j*{64 // PQ_M}+1 : cb.j*{64 // PQ_M}+{64 // PQ_M}], cb.c), 6) AS p6
  FROM q CROSS JOIN cb
),
adcp AS (
  SELECT c.vec_id, l.q_id, any_value(o.qc6) AS qc6,
         {", ".join(f"max(CASE WHEN c.j={j} THEN l.p6 END) AS p{j}" for j in range(PQ_M))}
  FROM codes c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN probes p ON p.c_id = a.c_id
  JOIN lut l ON l.q_id = p.q_id AND l.j = c.j AND l.code = c.code
  JOIN qoff o ON o.q_id = p.q_id AND o.c_id = a.c_id
  GROUP BY c.vec_id, l.q_id
),
adc AS (
  SELECT vec_id, q_id, round({_pq_fold(PQ_M, init="qc6")}, 6) AS adc6 FROM adcp
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc6 DESC, vec_id ASC) AS r
    FROM adc
  ) WHERE r <= {PQ_RERANK}
),
s AS (
  SELECT t.q_id, t.vec_id,
         round(list_dot_product(e.v, q.v) /
               (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos6
  FROM top t JOIN e ON e.vec_id = t.vec_id JOIN q ON q.q_id = t.q_id
)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",
        "ivfpq_ann_topk": f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (
  SELECT vec_id, v,
         list_transform(v, x -> x / greatest(sqrt(list_dot_product(v, v)), 1e-30)) AS nv
  FROM e0
),
samp AS (
  SELECT vec_id, nv, code FROM (
    SELECT vec_id, nv,
           row_number() OVER (ORDER BY md5('{PQ_SEED}' || vec_id::VARCHAR), vec_id) - 1 AS code
    FROM e
  ) WHERE code < {PQ_KSUB}
),
cb AS (
  SELECT j.j, s.code, s.nv[j.j*{64 // PQ_M}+1 : j.j*{64 // PQ_M}+{64 // PQ_M}] AS c
  FROM samp s, unnest(range(0, {PQ_M})) AS j(j)
),
sv AS (
  SELECT e.vec_id, j.j, e.nv[j.j*{64 // PQ_M}+1 : j.j*{64 // PQ_M}+{64 // PQ_M}] AS x
  FROM e, unnest(range(0, {PQ_M})) AS j(j)
),
dist AS (
  SELECT sv.vec_id, sv.j, cb.code,
         round(list_dot_product(sv.x, sv.x) - 2*list_dot_product(sv.x, cb.c)
               + list_dot_product(cb.c, cb.c), 6) AS d6
  FROM sv JOIN cb ON cb.j = sv.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d6 ASC, code ASC) AS r
    FROM dist
  ) WHERE r = 1
),
cents AS (
  SELECT vec_id AS c_id, v AS c FROM e0
  ORDER BY md5('{IVFPQ_SEED}' || vec_id::VARCHAR), vec_id LIMIT {IVFPQ_CENTS}
),
assign AS (
  SELECT vec_id, c_id FROM (
    SELECT e0.vec_id, c.c_id,
           row_number() OVER (PARTITION BY e0.vec_id
             ORDER BY round(list_dot_product(e0.v, c.c) /
                 (sqrt(list_dot_product(e0.v, e0.v)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM e0 CROSS JOIN cents c) WHERE r = 1
),
q AS (SELECT vec_id AS q_id, v, nv FROM e WHERE vec_id < 5),
probes AS (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round(list_dot_product(q.v, c.c) /
                 (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM q CROSS JOIN cents c) WHERE r <= {IVFPQ_NPROBE}
),
lut AS (
  SELECT q.q_id, cb.j, cb.code,
         round(list_dot_product(q.nv[cb.j*{64 // PQ_M}+1 : cb.j*{64 // PQ_M}+{64 // PQ_M}], cb.c), 6) AS p6
  FROM q CROSS JOIN cb
),
adcp AS (
  SELECT c.vec_id, l.q_id, {", ".join(f"max(CASE WHEN c.j={j} THEN l.p6 END) AS p{j}" for j in range(PQ_M))}
  FROM codes c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN probes p ON p.c_id = a.c_id
  JOIN lut l ON l.q_id = p.q_id AND l.j = c.j AND l.code = c.code
  GROUP BY c.vec_id, l.q_id
),
adc AS (
  SELECT vec_id, q_id, round({_pq_fold(PQ_M)}, 6) AS adc6 FROM adcp
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc6 DESC, vec_id ASC) AS r
    FROM adc
  ) WHERE r <= {PQ_RERANK}
),
s AS (
  SELECT t.q_id, t.vec_id,
         round(list_dot_product(e.v, q.v) /
               (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos6
  FROM top t JOIN e ON e.vec_id = t.vec_id JOIN q ON q.q_id = t.q_id
)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",
        "ivf_ann_topk": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS c_id, v AS c FROM e
  ORDER BY md5('{IVF_SEED}' || vec_id::VARCHAR), vec_id LIMIT {IVF_CENTROIDS}
),
assign AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e.vec_id, e.v, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.v, c.c) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM e CROSS JOIN cents c) WHERE r = 1
),
q AS (SELECT vec_id AS q_id, v AS w FROM e WHERE vec_id < 5),
probes AS (
  SELECT q_id, w, c_id FROM (
    SELECT q.q_id, q.w, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY round(list_dot_product(q.w, c.c) /
                 (sqrt(list_dot_product(q.w, q.w)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM q CROSS JOIN cents c) WHERE r <= {IVF_NPROBE}
),
s AS (
  SELECT p.q_id, a.vec_id,
         round(list_dot_product(a.v, p.w) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.w, p.w))), 6) AS cos6
  FROM assign a JOIN probes p USING (c_id)
)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
""",
        "emb_ivf_pairs": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS c_id, v AS c FROM e
  ORDER BY md5('{IVF_DUP_SEED}' || vec_id::VARCHAR), vec_id LIMIT {IVF_CENTROIDS}
),
assign AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e.vec_id, e.v, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.v, c.c) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
               c.c_id ASC) AS r
    FROM e CROSS JOIN cents c) WHERE r = 1
),
s AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         round(list_dot_product(x.v, y.v) /
               (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cos6
  FROM assign x JOIN assign y ON x.c_id = y.c_id AND x.vec_id < y.vec_id
)
SELECT a, b, cos6 FROM s ORDER BY cos6 DESC, a, b LIMIT 20
""",
        "emb_top_pairs": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         round(list_dot_product(x.v, y.v) /
               (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cos6
  FROM e x JOIN e y ON x.vec_id < y.vec_id
)
SELECT a, b, cos6 FROM s ORDER BY cos6 DESC, a, b LIMIT 20
""",
        "events_hourly": """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*)::BIGINT AS n,
       round(sum(value::DECIMAL(18,6)), 4)::DOUBLE AS sum_value4
FROM events GROUP BY 1, 2
""",
        "revenue_by_nation": """
SELECT n_name,
       round(sum(l_extendedprice::DECIMAL(18,4) * (1.0::DECIMAL(18,4) - l_discount::DECIMAL(18,4))), 2)::DOUBLE AS revenue2,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
""",
        "user_sessions": """
WITH e AS (
  SELECT user_id, ts,
         -- session_window is end-exclusive [start, last+gap): an event
         -- exactly `gap` after the previous one STARTS a new session → >=
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, session_id
""",
        "revenue_rollup": """
SELECT coalesce(n_name, 'ALL') AS n_name,
       round(sum(l_extendedprice::DECIMAL(18,4) * (1.0::DECIMAL(18,4) - l_discount::DECIMAL(18,4))), 2)::DOUBLE AS revenue2
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name)
""",
        "doc_sha256": "SELECT doc_id, sha256(coalesce(text, '')) AS sha FROM documents",
        # SimHash: DuckDB md5_number_upper(term) == numpy's little-endian
        # uint64 of the first 8 md5 bytes (verified), so the bit-vote is
        # fully SQL-expressible.
        "simhash": f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(coalesce(text, '')), '{TOK}'))) AS term
  FROM documents
),
h AS (SELECT doc_id, md5_number_upper(term) AS hv FROM tok),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (hv >> b::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
  GROUP BY 1, 2
),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN vote >= 0 THEN (1::HUGEINT << b::INTEGER) ELSE 0 END) AS u
  FROM bits GROUP BY 1
)
SELECT d.doc_id,
       coalesce((CASE WHEN s.u >= 9223372036854775808::HUGEINT
                      THEN s.u - 18446744073709551616::HUGEINT
                      ELSE s.u END)::BIGINT, 0) AS simhash
FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
""",
    }
    base = {
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
        "phrase_match": _phrase_match_sql(),
        "phrase_slop": _phrase_slop_sql(),
        "proximity_match": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
pr(pair_id, a, b) AS (VALUES {", ".join(f"({i}, '{a}', '{b}')" for i, a, b in PROX_PAIRS)}),
m AS (
  SELECT pair_id::BIGINT AS pair_id, doc_id,
         len(list_filter(range(1, len(toks) + 1), j -> toks[j] = a AND
             len(list_filter(range(j + 1, least(j + {PROX_SLOP}, len(toks)) + 1),
                             q -> toks[q] = b)) > 0))::BIGINT AS n_matches
  FROM t CROSS JOIN pr
)
SELECT pair_id, doc_id, n_matches FROM m WHERE n_matches > 0
""",
        # SpanFirstQuery: term occurrences among the first `limit` tokens
        # (engine offsets are 0-based; 1-based j ≤ limit is the same set).
        "span_first": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
q(sq_id, term, lim) AS (VALUES {", ".join(f"({i}, '{t}', {l})" for i, t, l in SPAN_FIRST_QS)}),
m AS (
  SELECT sq_id::BIGINT AS sq_id, doc_id,
         len(list_filter(range(1, least(lim, len(toks)) + 1),
                         j -> toks[j] = term))::BIGINT AS n_matches
  FROM t CROSS JOIN q
)
SELECT sq_id, doc_id, n_matches FROM m WHERE n_matches > 0
""",
        # Ordered SpanNearQuery, TOTAL-span budget (m−1)+slop, distinct
        # starts. m=2: q ∈ (p, p+1+slop]; m=3: chain p<q1<q2 ≤ p+2+slop.
        "span_near": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
q2(sq_id, t0, t1, slop) AS (VALUES {", ".join(f"({i}, '{a}', '{b}', {s})" for i, a, b, s in SPAN_NEAR2_QS)}),
m2 AS (
  SELECT sq_id::BIGINT AS sq_id, doc_id,
         len(list_filter(range(1, len(toks) + 1), p -> toks[p] = t0 AND
             len(list_filter(range(p + 1, least(p + 1 + slop, len(toks)) + 1),
                             q -> toks[q] = t1)) > 0))::BIGINT AS n_matches
  FROM t CROSS JOIN q2
),
m3 AS (
  SELECT {SPAN_NEAR3_Q[0]}::BIGINT AS sq_id, doc_id,
         len(list_filter(range(1, len(toks) + 1),
             p -> toks[p] = '{SPAN_NEAR3_Q[1]}' AND
             len(list_filter(range(p + 1, least(p + 1 + {SPAN_NEAR3_Q[4]}, len(toks)) + 1),
                 q1 -> toks[q1] = '{SPAN_NEAR3_Q[2]}' AND
                 len(list_filter(range(q1 + 1, least(p + 2 + {SPAN_NEAR3_Q[4]}, len(toks)) + 1),
                     q2 -> toks[q2] = '{SPAN_NEAR3_Q[3]}')) > 0)) > 0))::BIGINT AS n_matches
  FROM t
)
SELECT sq_id, doc_id, n_matches FROM m2 WHERE n_matches > 0
UNION ALL
SELECT sq_id, doc_id, n_matches FROM m3 WHERE n_matches > 0
""",
        "span_not": _span_not_sql(),
        # Unordered intervals with max_gaps: anchor-cover rule — count
        # 1-based anchors j (an occurrence of ANY term) where every term
        # occurs in [j, j + m + max_gaps − 1].
        "intervals": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
{" UNION ALL ".join(_interval_select(i, text.split(), g) for i, text, g in INTERVAL_QS)}
""",
        "snippet": f"""
WITH pat(pat_id, pattern) AS (VALUES {", ".join(f"({i}, '{p}')" for i, p in SNIPPET_PATTERNS)})
SELECT pat_id::BIGINT AS pat_id, doc_id,
       strpos(lower(coalesce(text, '')), lower(pattern))::INTEGER AS pos,
       substring(coalesce(text, ''),
                 greatest(1, strpos(lower(coalesce(text, '')), lower(pattern)) - {SNIPPET_W})::INTEGER,
                 (length(pattern) + {2 * SNIPPET_W})::INTEGER) AS snippet
FROM documents CROSS JOIN pat
WHERE strpos(lower(coalesce(text, '')), lower(pattern)) > 0
""",
        "search_snippets": _BM25_SQL_CTE + f""",
ranked AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
),
fq(query_id, fterm) AS (VALUES {", ".join(f"({i}, '{t.split()[0]}')" for i, t in PROBE_QUERIES)})
SELECT r.query_id, r.doc_id, r.rank::INTEGER AS rank,
       strpos(lower(coalesce(d.text, '')), lower(fq.fterm))::INTEGER AS pos,
       substring(coalesce(d.text, ''),
                 greatest(1, strpos(lower(coalesce(d.text, '')), lower(fq.fterm)) - {SNIPPET_W})::INTEGER,
                 (length(fq.fterm) + {2 * SNIPPET_W})::INTEGER) AS snippet
FROM ranked r
JOIN documents d USING (doc_id)
JOIN fq ON fq.query_id = r.query_id
""",
        "wildcard_count": f"""
WITH tok AS (SELECT unnest({_D_TOKS}) AS term FROM documents),
wq(wq_id, pat) AS (VALUES {", ".join(f"({i}, '{p.replace('*', '%')}')" for i, p in WILDCARD_PATTERNS)}),
c AS (
  SELECT wq_id, count(*)::BIGINT AS n FROM wq JOIN tok ON tok.term LIKE wq.pat GROUP BY 1
)
SELECT wq.wq_id::BIGINT AS wq_id, coalesce(c.n, 0)::BIGINT AS n_matches
FROM wq LEFT JOIN c USING (wq_id)
""",
        "sample_docs": f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substring(md5('{SAMPLE_SEED}' || doc_id::VARCHAR), 1, 8))::BIGINT <
      (CASE {" ".join(f"WHEN lang = '{s}' THEN {int(f * 2**32)}" for s, f in sorted(SAMPLE_FRACTIONS.items()))}
            ELSE {int(SAMPLE_DEFAULT * 2**32)} END)
""",
        "dedup_keep": """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         min(doc_id) OVER (PARTITION BY md5(coalesce(text, ''))) AS c
  FROM documents
) WHERE doc_id = c
""",
        "regex_count": f"""
WITH tok AS (SELECT unnest({_D_TOKS}) AS term FROM documents),
rq(rq_id, pat) AS (VALUES {", ".join(f"({i}, '^(?:{p})$')" for i, p in REGEX_PATTERNS)}),
c AS (
  SELECT rq_id, count(*)::BIGINT AS n
  FROM rq JOIN tok ON regexp_matches(tok.term, rq.pat) GROUP BY 1
)
SELECT rq.rq_id::BIGINT AS rq_id, coalesce(c.n, 0)::BIGINT AS n_matches
FROM rq LEFT JOIN c USING (rq_id)
""",
        "wildcard_topk": f"""
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
wq(query_id, pat) AS (VALUES {", ".join(f"({i}, '{p.replace('*', '%')}')" for i, p in WILDCARD_PATTERNS)}),
qterms AS (
  SELECT DISTINCT query_id::BIGINT AS query_id, v.term
  FROM wq JOIN (SELECT DISTINCT term FROM tok) v ON v.term LIKE wq.pat
),
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
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""",
        "wildcard_docs": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
wq(wq_id, pat) AS (VALUES {", ".join(f"({i}, '{p.replace('*', '%')}')" for i, p in WILDCARD_PATTERNS)})
SELECT DISTINCT wq_id::BIGINT AS wq_id, doc_id
FROM (SELECT doc_id, unnest(toks) AS tok FROM t) s CROSS JOIN wq
WHERE s.tok LIKE wq.pat
""",
        "boolean_match": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
bq(bq_id, must, must_not) AS (VALUES {", ".join(
    "({}, [{}], {})".format(
        i,
        ",".join(f"'{w}'" for w in m.split()),
        "[" + ",".join(f"'{w}'" for w in n.split()) + "]" if n else "[]::VARCHAR[]",
    )
    for i, m, n in BOOL_QUERIES
)})
SELECT bq_id::BIGINT AS bq_id, doc_id
FROM t CROSS JOIN bq
WHERE list_has_all(toks, must) AND NOT list_has_any(toks, must_not)
""",
        # SHOULD + minimum_should_match (msm resolved to the engine's
        # Lucene-default rule in Python so the SQL stays declarative).
        "boolean_should": f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
bq(bq_id, must, should, must_not, msm) AS (VALUES {", ".join(
    "({}, {}, {}, {}, {})".format(
        i,
        "[" + ",".join(f"'{w}'" for w in m.split()) + "]" if m else "[]::VARCHAR[]",
        "[" + ",".join(f"'{w}'" for w in s.split()) + "]" if s else "[]::VARCHAR[]",
        "[" + ",".join(f"'{w}'" for w in n.split()) + "]" if n else "[]::VARCHAR[]",
        (lambda eff: max(eff, 1) if not m and s else eff)(
            msm if msm is not None else (0 if m else 1)
        ),
    )
    for i, m, s, n, msm in BOOL_SHOULD_QUERIES
)})
SELECT bq_id::BIGINT AS bq_id, doc_id
FROM t CROSS JOIN bq
WHERE list_has_all(toks, must) AND NOT list_has_any(toks, must_not)
  AND len(list_filter(should, s -> list_contains(toks, s))) >= msm
""",
        "byte_match_count": f"""
WITH pat(pat_id, pattern, k) AS (VALUES {", ".join(f"({i}, '{p}', {k})" for i, p, k in BYTE_PATTERNS)})
SELECT pat_id::BIGINT AS pat_id, doc_id,
       (CASE WHEN length(coalesce(text, '')) = 0 THEN 0
        ELSE len(list_filter(range(1, length(coalesce(text, '')) + 1),
             j -> levenshtein(left(pattern, (length(coalesce(text, '')) - j + 1)::INTEGER),
                              substring(coalesce(text, ''), j::INTEGER, length(pattern))) <= k))
        END)::BIGINT AS n_matches
FROM documents CROSS JOIN pat
""",
        # Byte-exact variant: the byte view bv is rebuilt from
        # hex(encode(text)) — chr(byte) per octet, i.e. the same
        # ISO-8859-1 byte↔codepoint bijection the Spark side uses — so
        # levenshtein/substring/length below are BYTE-granularity. The
        # ASCII patterns are their own byte view.
        "byte_match_binary": f"""
WITH pat(pat_id, pattern, k) AS (VALUES {", ".join(f"({i}, '{p}', {k})" for i, p, k in BYTE_PATTERNS)}),
t AS (
  SELECT doc_id,
         array_to_string(list_transform(
             range(1, octet_length(encode(coalesce(text, ''))) + 1),
             i -> chr(('0x' || substring(hex(encode(coalesce(text, ''))),
                                         (2*i-1)::INT, 2))::INT)), '') AS bv
  FROM documents)
SELECT pat_id::BIGINT AS pat_id, doc_id,
       (CASE WHEN length(bv) = 0 THEN 0
        ELSE len(list_filter(range(1, length(bv) + 1),
             j -> levenshtein(left(pattern, (length(bv) - j + 1)::INTEGER),
                              substring(bv, j::INTEGER, length(pattern))) <= k))
        END)::BIGINT AS n_matches
FROM t CROSS JOIN pat
""",
    }
    # LSH ANN: md5-derived planes make the whole pipeline SQL-expressible —
    # plane[d][b] = (md5_u64("lsh:b:d") / 2^64) * 2 - 1, bucket = sign-bit
    # pack, probes = bucket + its 8 Hamming-1 neighbors, exact cosine
    # re-rank inside probed buckets.
    _plane = (
        "((md5_number_upper('lsh:' || bb || ':' || d)::DOUBLE"
        " / 18446744073709551616.0) * 2.0 - 1.0)"
    )
    extra["lsh_ann_topk"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
eb AS (
  SELECT vec_id, v,
    list_sum(list_transform(range(0, 8), bb ->
      CASE WHEN list_sum(list_transform(range(0, 64), d ->
        v[(d+1)::INTEGER] * {_plane})) >= 0
      THEN (1::BIGINT << bb::INTEGER) ELSE 0::BIGINT END))::BIGINT AS bucket
  FROM e
),
q AS (SELECT vec_id AS q_id, v AS w, bucket AS qb FROM eb WHERE vec_id < 5),
probes AS (
  SELECT q_id, w,
         unnest(list_prepend(qb, list_transform(range(0, 8),
                bb -> xor(qb, (1::BIGINT << bb::INTEGER))))) AS bucket
  FROM q
),
s AS (
  SELECT q_id, eb.vec_id,
         round(list_dot_product(eb.v, w) /
               (sqrt(list_dot_product(eb.v, eb.v)) * sqrt(list_dot_product(w, w))), 6) AS cos6
  FROM probes JOIN eb USING (bucket)
)
SELECT q_id, vec_id, cos6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id ASC) AS rank FROM s
) WHERE rank <= 10
"""
    extra["bm25_topk_engine"] = base["bm25_topk"]
    # MultiReader search over two half-indexes: segmentation must be
    # invisible — the single-corpus bm25 oracle IS the spec.
    extra["multi_index"] = base["bm25_topk"]
    # search_after page 2 = rows 11..20 of the same full ordering, ranks
    # restarting at 1 (Lucene returns fresh TopDocs per page).
    extra["search_after"] = _BM25_SQL_CTE + """
SELECT query_id, doc_id, (rank - 10)::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank BETWEEN 11 AND 20
"""
    # Multi-field: per-field scored CTE (per-field tf/df/dl/avgdl — the
    # BM25F-lite per-field statistics), weighted union-sum, round-6 rank.
    routed = _mf_routed()

    def _mf_cte(col: str, a: str, boost: float, rows=None) -> str:
        rows = routed[a] if rows is None else rows
        vals = ", ".join(f"({i}, '{t}')" for i, t in rows) or "(NULL, NULL)"
        return f"""
tok_{a} AS (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce({col}, '')), '{TOK}')) AS term FROM documents),
tf_{a} AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok_{a} GROUP BY 1, 2),
dl_{a} AS (SELECT doc_id, len(regexp_extract_all(lower(coalesce({col}, '')), '{TOK}'))::BIGINT AS dl FROM documents),
stats_{a} AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl_{a}),
dfreq_{a} AS (SELECT term, count(*)::BIGINT AS df FROM tf_{a} GROUP BY 1),
qt_{a}(query_id, term) AS (VALUES {vals}),
scored_{a} AS (
  SELECT qt_{a}.query_id::BIGINT AS query_id, tf_{a}.doc_id,
         {boost} * sum(
           ln(1 + (stats_{a}.n_docs - dfreq_{a}.df + 0.5) / (dfreq_{a}.df + 0.5))
           * tf_{a}.tf * ({K1} + 1.0)
           / (tf_{a}.tf + {K1} * (1.0 - {B} + {B} * dl_{a}.dl / stats_{a}.avgdl))
         ) AS score
  FROM qt_{a}
  JOIN tf_{a} USING (term)
  JOIN dfreq_{a} USING (term)
  JOIN dl_{a} ON tf_{a}.doc_id = dl_{a}.doc_id
  CROSS JOIN stats_{a}
  GROUP BY 1, 2
)"""

    extra["multifield_topk"] = f"""
WITH {_mf_cte("text", "text", MF_BOOSTS["text"])},
{_mf_cte("source", "source", MF_BOOSTS["source"])}
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM (
    SELECT query_id, doc_id, round(sum(score), 6) AS score6
    FROM (SELECT * FROM scored_text UNION ALL SELECT * FROM scored_source)
    GROUP BY 1, 2
  )
) WHERE rank <= 10
"""
    # DisMax: best field + tie_breaker × the rest (max + tie·(sum − max)
    # per doc over the boosted per-field sums; a field with no match
    # contributes 0, matching the engine's max-over-matching-fields).
    extra["dismax_topk"] = f"""
WITH {_mf_cte("text", "text", MF_BOOSTS["text"])},
{_mf_cte("source", "source", MF_BOOSTS["source"])}
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM (
    SELECT query_id, doc_id,
           round(max(score) + {DISMAX_TIE} * (sum(score) - max(score)), 6) AS score6
    FROM (SELECT * FROM scored_text UNION ALL SELECT * FROM scored_source)
    GROUP BY 1, 2
  )
) WHERE rank <= 10
"""
    # cross_fields: term-centric blended-df scoring. Blend = max df over
    # fields (BlendedTermQuery); per-term dismax with tie_breaker; sum
    # over clauses. 2-token queries keep all float sums at 2 addends.
    from dts.tokenizer import tokenize_text as _cf_tok

    _cf_terms: dict[str, int] = {}
    _cf_occ: list[tuple[int, int, int]] = []
    for _qid, _text in CF_QUERIES:
        for _clause, _t in enumerate(_cf_tok(_text)):
            _tid = _cf_terms.setdefault(_t, len(_cf_terms))
            _cf_occ.append((_qid, _clause, _tid))
    _cf_qt = ", ".join(f"({tid}, '{t}')" for t, tid in _cf_terms.items())
    _cf_occv = ", ".join(f"({q}, {c}, {t})" for q, c, t in _cf_occ)
    _cf_boostv = ", ".join(f"('{f}', {b})" for f, b in sorted(CF_BOOSTS.items()))
    extra["cross_fields"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '{TOK}') AS tk
  FROM documents
),
fld AS (
  SELECT 'text' AS f, doc_id, tk FROM toks
  UNION ALL
  SELECT 'head', doc_id, tk[1:8] FROM toks
),
tfc AS (
  SELECT f, doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT f, doc_id, unnest(tk) AS term FROM fld)
  GROUP BY 1, 2, 3
),
dl AS (SELECT f, doc_id, len(tk)::BIGINT AS dl FROM fld),
stats AS (SELECT f, count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl GROUP BY 1),
dfq AS (SELECT f, term, count(*)::BIGINT AS df FROM tfc GROUP BY 1, 2),
qt(tid, term) AS (VALUES {_cf_qt}),
dfb AS (
  SELECT qt.tid, qt.term, max(dfq.df) AS dfb
  FROM qt JOIN dfq USING (term) GROUP BY 1, 2
),
boost(f, b) AS (VALUES {_cf_boostv}),
scored AS (
  SELECT dfb.tid, tfc.doc_id,
         boost.b * ln(1 + (stats.n_docs - dfb.dfb + 0.5) / (dfb.dfb + 0.5))
         * tfc.tf * ({K1} + 1.0)
         / (tfc.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS fscore
  FROM dfb
  JOIN tfc ON tfc.term = dfb.term
  JOIN dl ON dl.f = tfc.f AND dl.doc_id = tfc.doc_id
  JOIN stats ON stats.f = tfc.f
  JOIN boost ON boost.f = tfc.f
),
pterm AS (
  SELECT tid, doc_id,
         max(fscore) + {CF_TIE} * (sum(fscore) - max(fscore)) AS tscore
  FROM scored GROUP BY 1, 2
),
occ(query_id, clause, tid) AS (VALUES {_cf_occv}),
total AS (
  SELECT occ.query_id::BIGINT AS query_id, p.doc_id, sum(p.tscore) AS score
  FROM occ JOIN pterm p USING (tid) GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM total
) WHERE rank <= 10
"""
    # combined_fields (BM25F): weighted tf summed across fields into ONE
    # saturation; dlc/avgdlc in SORTED field order (head, text) exactly as
    # the engine builds them; df_c = min(n_docs, Σ_f df_f). Reuses the
    # cross_fields term/occurrence VALUES (same queries).
    extra["combined_fields"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '{TOK}') AS tk
  FROM documents
),
fld AS (
  SELECT 'head' AS f, doc_id, tk[1:8] AS tk FROM toks
  UNION ALL
  SELECT 'text', doc_id, tk FROM toks
),
w(f, wt) AS (VALUES ('head', {CF_BOOSTS['head']}), ('text', {CF_BOOSTS['text']})),
tfc AS (
  SELECT f, doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT f, doc_id, unnest(tk) AS term FROM fld)
  GROUP BY 1, 2, 3
),
dl AS (SELECT f, doc_id, len(tk)::BIGINT AS dl FROM fld),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
av AS (
  SELECT {CF_BOOSTS['head']} * (SELECT avg(dl)::DOUBLE FROM dl WHERE f = 'head')
       + {CF_BOOSTS['text']} * (SELECT avg(dl)::DOUBLE FROM dl WHERE f = 'text') AS avgdlc
),
dlc AS (
  SELECT doc_id,
         {CF_BOOSTS['head']} * max(CASE WHEN f = 'head' THEN dl END)::DOUBLE
       + {CF_BOOSTS['text']} * max(CASE WHEN f = 'text' THEN dl END)::DOUBLE AS dlc
  FROM dl GROUP BY 1
),
qt(tid, term) AS (VALUES {_cf_qt}),
dfq AS (SELECT f, term, count(*)::BIGINT AS df FROM tfc GROUP BY 1, 2),
dfc AS (
  SELECT qt.tid, qt.term,
         least((SELECT n_docs FROM nd), sum(dfq.df))::BIGINT AS dfc
  FROM qt JOIN dfq USING (term) GROUP BY 1, 2
),
wtfc AS (
  SELECT t.term, t.doc_id, sum(w.wt * t.tf::DOUBLE) AS wtf
  FROM tfc t JOIN w USING (f) GROUP BY 1, 2
),
scored AS (
  SELECT dfc.tid, wt.doc_id,
         ln(1.0 + ((SELECT n_docs FROM nd)::DOUBLE - dfc.dfc + 0.5) / (dfc.dfc + 0.5))
         * (wt.wtf * ({K1} + 1.0)
            / (wt.wtf + {K1} * (1.0 - {B} + {B} * dlc.dlc / (SELECT avgdlc FROM av)))) AS contrib
  FROM dfc
  JOIN wtfc wt ON wt.term = dfc.term
  JOIN dlc ON dlc.doc_id = wt.doc_id
),
occ(query_id, clause, tid) AS (VALUES {_cf_occv}),
total AS (
  SELECT occ.query_id::BIGINT AS query_id, s.doc_id, sum(s.contrib) AS score
  FROM occ JOIN scored s USING (tid) GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM total
) WHERE rank <= 10
"""
    # Scored phrases (round 5): recount each phrase on the token stream
    # (start offsets j with toks[j+i] = term_i for all i), df = docs with
    # count > 0, then the exact BM25 formula; query 2 adds its term score.
    def _pc_select(qid: int, phrase: str) -> str:
        terms = phrase.split(" ")
        m = len(terms)
        cond = " AND ".join(
            f"toks[j + {i}] = '{t}'" for i, t in enumerate(terms)
        )
        return f"""
SELECT {qid}::BIGINT AS query_id, doc_id,
       len(list_filter(range(1, len(toks) - {m} + 2), j -> {cond}))::BIGINT AS cnt
FROM t WHERE len(toks) >= {m}"""

    extra["phrase_scored"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM t),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
pc AS ({_pc_select(0, "fast join")}
UNION ALL {_pc_select(1, "customer order")}
UNION ALL {_pc_select(2, "fast join")}),
pcpos AS (SELECT * FROM pc WHERE cnt > 0),
pdf AS (SELECT query_id, count(*)::BIGINT AS df FROM pcpos GROUP BY 1),
ps AS (
  SELECT p.query_id, p.doc_id,
         ln(1 + (stats.n_docs - pdf.df + 0.5) / (pdf.df + 0.5))
         * p.cnt * ({K1} + 1.0)
         / (p.cnt + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS pscore
  FROM pcpos p JOIN pdf USING (query_id) JOIN dl USING (doc_id)
  CROSS JOIN stats
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
ts AS (
  SELECT 2::BIGINT AS query_id, tf.doc_id,
         ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf * ({K1} + 1.0)
         / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS tscore
  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term = 'data'
),
total AS (
  SELECT ps.query_id, ps.doc_id,
         round(ps.pscore + coalesce(ts.tscore, 0.0), 6) AS score6
  FROM ps LEFT JOIN ts
    ON ts.query_id = ps.query_id AND ts.doc_id = ps.doc_id
)
SELECT query_id, doc_id, score6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM total
) WHERE rank <= 10
"""
    # Percolation: per-registered-query boolean/phrase legs over toks.
    extra["percolate"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
u AS (
  SELECT doc_id, 0::BIGINT AS query_id FROM t
  WHERE len(list_intersect(toks, ['batch', 'stream'])) > 0
  UNION ALL
  SELECT doc_id, 1::BIGINT FROM t
  WHERE list_contains(toks, 'hash') AND NOT list_contains(toks, 'slow')
  UNION ALL
  SELECT doc_id, 2::BIGINT FROM t
  WHERE len(list_filter(range(1, len(toks)),
        j -> toks[j] = 'table' AND toks[j + 1] = 'scan')) > 0
  UNION ALL
  SELECT doc_id, 3::BIGINT FROM t
  WHERE list_contains(toks, 'merge') AND
        len(list_filter(range(1, len(toks)), p -> toks[p] = 'fast' AND
            len(list_filter(range(p + 1, least(p + 3, len(toks)) + 1),
                q -> toks[q] = 'join')) > 0)) > 0
)
SELECT doc_id, query_id FROM u
"""
    # TermRangeQuery: docs with >=1 term in the dictionary range.
    def _tr_lit(v):
        return "NULL" if v is None else "'" + v + "'"

    _tr_vals = ", ".join(
        "({}, {}, {}, {}, {})".format(i, _tr_lit(lo), _tr_lit(hi), li, hii)
        for i, lo, hi, li, hii in TERM_RANGES
    )
    extra["term_range"] = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({_D_TOKS}) AS term FROM documents
),
r(wq_id, lo, hi, li, hii) AS (VALUES {_tr_vals})
SELECT DISTINCT r.wq_id::BIGINT AS wq_id, tok.doc_id
FROM tok JOIN r
  ON (r.lo IS NULL OR (CASE WHEN r.li THEN tok.term >= r.lo ELSE tok.term > r.lo END))
 AND (r.hi IS NULL OR (CASE WHEN r.hii THEN tok.term <= r.hi ELSE tok.term < r.hi END))
"""
    # Score explanation: per-clause factors for each query's top-3 docs.
    extra["explain"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qsplit AS (SELECT query_id::BIGINT AS query_id, string_split(text, ' ') AS toks_q FROM q),
qn AS (SELECT query_id, toks_q, unnest(range(1, len(toks_q) + 1)) AS j FROM qsplit),
qterms AS (SELECT query_id, (j - 1)::INTEGER AS clause, toks_q[j] AS term FROM qn),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         round(sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ), 6) AS score6
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
top3 AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC
    ) AS r FROM scored
  ) WHERE r <= 3
)
SELECT qt.query_id, t3.doc_id, qt.clause, qt.term, tf.tf, dl.dl, dfreq.df,
       round(
         ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf * ({K1} + 1.0)
         / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)), 6
       ) AS contrib6
FROM top3 t3
JOIN qterms qt USING (query_id)
JOIN tf ON tf.doc_id = t3.doc_id AND tf.term = qt.term
JOIN dfreq ON dfreq.term = qt.term
JOIN dl ON dl.doc_id = t3.doc_id
CROSS JOIN stats
"""
    # Rescore window: top-RESCORE_W primary BM25 candidates re-sorted by
    # qw·primary + rw·phrase_score (phrase = the whole query text).
    extra["rescore"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM t),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {", ".join(f"({i}, '{s}')" for i, s in RESCORE_QS)}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         sum(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * ({K1} + 1.0)
             / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
win AS (
  SELECT query_id, doc_id, s FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY round(s, 6) DESC, doc_id ASC
    ) AS r FROM scored
  ) WHERE r <= {RESCORE_W}
),
pc AS ({_pc_select(*RESCORE_QS[0])}
UNION ALL {_pc_select(*RESCORE_QS[1])}),
pcpos AS (SELECT * FROM pc WHERE cnt > 0),
pdf AS (SELECT query_id, count(*)::BIGINT AS df FROM pcpos GROUP BY 1),
ps AS (
  SELECT p.query_id, p.doc_id,
         ln(1 + (stats.n_docs - pdf.df + 0.5) / (pdf.df + 0.5))
         * p.cnt * ({K1} + 1.0)
         / (p.cnt + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS pscore
  FROM pcpos p JOIN pdf USING (query_id) JOIN dl USING (doc_id)
  CROSS JOIN stats
),
total AS (
  SELECT w.query_id, w.doc_id,
         round({RESCORE_QW} * w.s + {RESCORE_RW} * coalesce(ps.pscore, 0.0), 6) AS s6
  FROM win w LEFT JOIN ps ON ps.query_id = w.query_id AND ps.doc_id = w.doc_id
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY s6 DESC, doc_id ASC
  ) AS rank FROM total
) WHERE rank <= {RESCORE_K}
"""
    # Unified grammar over the same two-field index (round 5): the scored
    # CTEs reuse _mf_cte with the parser-derived routing; eligibility =
    # every MUST term present (in its field), no MUST_NOT term present,
    # and the quoted phrase present as a token bigram (probe queries carry
    # at most one phrase per query, text field).
    sf_score, sf_must, sf_not, sf_ph = _sf_routed()

    def _vals2(rows):
        return ", ".join(f"({i}, '{t}')" for i, t in rows) or "(NULL, NULL)"

    extra["search_fields"] = f"""
WITH {_mf_cte("text", "text", MF_BOOSTS["text"], sf_score["text"])},
{_mf_cte("source", "source", MF_BOOSTS["source"], sf_score["source"])},
mt(query_id, term) AS (VALUES {_vals2(sf_must["text"])}),
ms(query_id, term) AS (VALUES {_vals2(sf_must["source"])}),
nt(query_id, term) AS (VALUES {_vals2(sf_not["text"])}),
ns(query_id, term) AS (VALUES {_vals2(sf_not["source"])}),
ph(query_id, phrase) AS (VALUES {_vals2(sf_ph)}),
mtot AS (SELECT query_id, count(*)::BIGINT AS m FROM (
  SELECT query_id, 't:' || term AS c FROM mt WHERE term IS NOT NULL
  UNION ALL SELECT query_id, 's:' || term FROM ms WHERE term IS NOT NULL
) GROUP BY 1),
msat AS (SELECT query_id, doc_id, count(DISTINCT c)::BIGINT AS p FROM (
  SELECT mt.query_id, tf_text.doc_id, 't:' || mt.term AS c
  FROM mt JOIN tf_text ON tf_text.term = mt.term
  UNION ALL
  SELECT ms.query_id, tf_source.doc_id, 's:' || ms.term
  FROM ms JOIN tf_source ON tf_source.term = ms.term
) GROUP BY 1, 2),
ex AS (SELECT DISTINCT query_id, doc_id FROM (
  SELECT nt.query_id, tf_text.doc_id FROM nt JOIN tf_text ON tf_text.term = nt.term
  UNION ALL
  SELECT ns.query_id, tf_source.doc_id FROM ns JOIN tf_source ON tf_source.term = ns.term
)),
ttoks AS (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '{TOK}') AS toks FROM documents),
phsat AS (
  SELECT DISTINCT ph.query_id, t.doc_id, 1 AS pok FROM ph, ttoks t
  WHERE ph.phrase IS NOT NULL AND list_contains(
    list_transform(range(0, len(t.toks) - 1), i -> t.toks[i+1] || ' ' || t.toks[i+2]),
    ph.phrase)
),
phq AS (SELECT DISTINCT query_id, 1 AS hasph FROM ph WHERE phrase IS NOT NULL),
combined AS (
  SELECT query_id, doc_id, round(sum(score), 6) AS score6
  FROM (SELECT * FROM scored_text UNION ALL SELECT * FROM scored_source)
  GROUP BY 1, 2
),
elig AS (
  SELECT c.query_id, c.doc_id, c.score6
  FROM combined c
  LEFT JOIN mtot USING (query_id)
  LEFT JOIN msat ON msat.query_id = c.query_id AND msat.doc_id = c.doc_id
  LEFT JOIN (SELECT query_id, doc_id, 1 AS x FROM ex) e
    ON e.query_id = c.query_id AND e.doc_id = c.doc_id
  LEFT JOIN phq ON phq.query_id = c.query_id
  LEFT JOIN phsat ps ON ps.query_id = c.query_id AND ps.doc_id = c.doc_id
  WHERE coalesce(mtot.m, 0) = coalesce(msat.p, 0)
    AND e.x IS NULL
    AND (phq.hasph IS NULL OR ps.pok = 1)
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM elig
) WHERE rank <= 10
"""
    # Conjunctive mode: eligibility = doc carries every distinct query
    # term; scores unchanged. (Probe queries have no duplicate tokens, so
    # distinct-term presence == clause presence.)
    extra["bm25_topk_and"] = _BM25_SQL_CTE + """
, qm AS (SELECT query_id, count(DISTINCT term)::BIGINT AS m FROM qterms GROUP BY 1),
present AS (
  SELECT qterms.query_id, tf.doc_id, count(DISTINCT tf.term)::BIGINT AS p
  FROM qterms JOIN tf USING (term) GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT s.query_id, s.doc_id,
         row_number() OVER (PARTITION BY s.query_id ORDER BY s.score6 DESC, s.doc_id ASC) AS rank
  FROM scored s
  JOIN present pr ON s.query_id = pr.query_id AND s.doc_id = pr.doc_id
  JOIN qm ON qm.query_id = s.query_id
  WHERE pr.p = qm.m
) WHERE rank <= 10
"""
    extra["dup_clusters"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len({_D_TOKS}) < 1 THEN [array_to_string({_D_TOKS}, ' ')]
         ELSE list_distinct({_D_TOKS}) END) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS shared
  FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id GROUP BY 1, 2
),
jp AS (
  SELECT a, b
  FROM p JOIN sizes sa ON p.a = sa.doc_id JOIN sizes sb ON p.b = sb.doc_id
  WHERE round(shared / (sa.n_sh + sb.n_sh - shared), 6) >= 0.5
),
edges AS (SELECT a AS s, b AS d FROM jp UNION SELECT b AS s, a AS d FROM jp),
reach(node, r) AS (
  SELECT s AS node, s AS r FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node
)
SELECT node AS doc_id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY 1
"""
    extra["facet_lang"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
bq(bq_id, must, must_not) AS (VALUES {", ".join(
    "({}, [{}], {})".format(
        i,
        ",".join(f"'{w}'" for w in m.split()),
        "[" + ",".join(f"'{w}'" for w in n.split()) + "]" if n else "[]::VARCHAR[]",
    )
    for i, m, n in BOOL_QUERIES
)}),
m AS (
  SELECT bq_id::BIGINT AS bq_id, doc_id
  FROM t CROSS JOIN bq
  WHERE list_has_all(toks, must) AND NOT list_has_any(toks, must_not)
)
SELECT m.bq_id, d.lang, count(*)::BIGINT AS n
FROM m JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""
    # The sidecar probe answers from the index's doc_meta projection; the
    # ground truth is the same documents-join facet.
    extra["facet_lang_sidecar"] = extra["facet_lang"]
    extra["term_vectors"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_D_TOKS}) AS term
  FROM documents WHERE doc_id IN {TV_FETCH_IDS}
)
SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
"""
    extra["sig_terms"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
bq(bq_id, must, must_not) AS (VALUES {", ".join(
    "({}, [{}], {})".format(
        i,
        ",".join(f"'{w}'" for w in m.split()),
        "[" + ",".join(f"'{w}'" for w in n.split()) + "]" if n else "[]::VARCHAR[]",
    )
    for i, m, n in BOOL_QUERIES
)}),
m AS (
  SELECT bq_id::BIGINT AS bq_id, doc_id
  FROM t CROSS JOIN bq
  WHERE list_has_all(toks, must) AND NOT list_has_any(toks, must_not)
),
fgsize AS (SELECT bq_id, count(*)::BIGINT AS fg_size FROM m GROUP BY 1),
dt AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t),
fg AS (
  SELECT m.bq_id, dt.term, count(*)::BIGINT AS fg_count
  FROM m JOIN dt USING (doc_id) GROUP BY 1, 2
  HAVING count(*) >= 2
),
bg AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
sc AS (
  SELECT fg.bq_id, fg.term, fg.fg_count,
         round((fg.fg_count / fg_size - df / n_docs)
               * (fg.fg_count / fg_size) / (df / n_docs), 6) AS jlh6
  FROM fg JOIN fgsize USING (bq_id) JOIN bg USING (term) CROSS JOIN nd
)
SELECT bq_id, term, fg_count, jlh6, rank::INTEGER AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY bq_id ORDER BY jlh6 DESC, term) AS rank
  FROM sc WHERE jlh6 > 0
) WHERE rank <= 5
"""
    extra["top_hits"] = _BM25_SQL_CTE + """
SELECT query_id, lang, doc_id, score6, hit_rank::INTEGER AS hit_rank
FROM (
  SELECT scored.query_id, d.lang, scored.doc_id, scored.score6,
         row_number() OVER (
           PARTITION BY scored.query_id, d.lang
           ORDER BY scored.score6 DESC, scored.doc_id) AS hit_rank
  FROM scored JOIN documents d USING (doc_id)
) WHERE hit_rank <= 2
"""
    # Tombstone phase: FULL-corpus stats (the scored CTE is unchanged),
    # deleted docs filtered out just before ranking — Lucene's live-docs
    # semantics, which the engine implements between delete and compact.
    extra["bm25_topk_tombstone"] = _BM25_SQL_CTE + f"""
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored WHERE doc_id % {DELETE_PRED_MOD} <> {DELETE_PRED_REM}
) WHERE rank <= 10
"""
    # One-call query string: multiset scoring + filter-context constraints.
    _TOKS_D = f"regexp_extract_all(lower(coalesce(text, '')), '{TOK}')"
    extra["search_query"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_TOKS_D})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qterms(term) AS (VALUES ('fast'), ('table'), ('scan'), ('join')),
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ), 6) AS score6
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1
),
eligible AS (
  SELECT doc_id FROM documents
  WHERE list_contains({_TOKS_D}, 'join')
    AND NOT list_contains({_TOKS_D}, 'slow')
    AND list_contains(
          list_transform(range(0, len({_TOKS_D}) - 1),
                         i -> {_TOKS_D}[i + 1] || ' ' || {_TOKS_D}[i + 2]),
          'table scan')
)
SELECT 0::BIGINT AS query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT doc_id,
         row_number() OVER (ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored WHERE doc_id IN (SELECT doc_id FROM eligible)
) WHERE rank <= 10
"""
    # Nested boolean trees: per-term BM25 contributions pivoted to one row
    # per doc (NULL = term absent), then each tree shape is a closed-form
    # match predicate + score expression mirroring dts.qtree's semantics
    # (a subtree contributes only when it matched; group boost multiplies
    # its leaves; group ~2 counts should-matches).
    _bt_terms = [
        "fast", "join", "scan", "table", "customer", "order", "slow",
        "merge", "query", "data",
    ]
    _bt_piv = ",\n    ".join(
        f"max(CASE WHEN term = '{t}' THEN c END) AS s_{t}"
        for t in _bt_terms
    )
    extra["bool_tree_topk"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_TOKS_D})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
s AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf * ({K1} + 1.0)
         / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN ({", ".join(f"'{t}'" for t in _bt_terms)})
),
piv AS (
  SELECT doc_id,
    {_bt_piv}
  FROM s GROUP BY doc_id
),
all_q AS (
  SELECT 0::BIGINT AS query_id, doc_id,
         round(s_fast + coalesce(s_join, 0) + coalesce(s_scan, 0), 6) AS score6
  FROM piv
  WHERE s_fast IS NOT NULL AND (s_join IS NOT NULL OR s_scan IS NOT NULL)
  UNION ALL
  SELECT 1, doc_id,
         round(coalesce(s_table, 0)
               + CASE WHEN s_customer IS NOT NULL AND s_order IS NOT NULL
                      THEN s_customer + s_order ELSE 0 END, 6)
  FROM piv
  WHERE s_table IS NOT NULL
     OR (s_customer IS NOT NULL AND s_order IS NOT NULL)
  UNION ALL
  SELECT 2, doc_id,
         round(coalesce(s_fast, 0) + coalesce(s_join, 0)
               + coalesce(s_scan, 0), 6)
  FROM piv
  WHERE (s_fast IS NOT NULL)::INTEGER + (s_join IS NOT NULL)::INTEGER
        + (s_scan IS NOT NULL)::INTEGER >= 2
  UNION ALL
  SELECT 3, doc_id, round(s_query, 6)
  FROM piv
  WHERE s_query IS NOT NULL AND s_slow IS NULL AND s_merge IS NULL
  UNION ALL
  SELECT 4, doc_id,
         round(2 * coalesce(s_table, 0) + 2 * coalesce(s_scan, 0)
               + coalesce(s_data, 0), 6)
  FROM piv
  WHERE s_table IS NOT NULL OR s_scan IS NOT NULL OR s_data IS NOT NULL
  UNION ALL
  SELECT 5, doc_id,
         round(s_fast + coalesce(s_join, 0) + coalesce(s_scan, 0), 6)
  FROM piv
  WHERE s_fast IS NOT NULL AND (s_join IS NOT NULL OR s_scan IS NOT NULL)
    AND s_slow IS NULL
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC
         ) AS rank
  FROM all_q
) WHERE rank <= 10
"""
    # Did-you-mean: nearest vocab terms, (distance, cf DESC, term) ranking.
    # Candidates use THE ENGINE'S generation rule (shared trigrams ≥
    # max(1, |tri(q)|−3k) and |len Δ| ≤ k — the same sound-but-1-floored
    # n-gram prefilter Lucene's spellchecker applies), not a full sweep:
    # a dist-2 edit on a short term can destroy every trigram, and such
    # candidates are by-design out of reach of term~k queries too.
    extra["suggest"] = f"""
WITH tok AS (SELECT unnest({_TOKS_D}) AS term FROM documents),
stats AS (SELECT term, count(*)::BIGINT AS cf FROM tok GROUP BY 1),
inp(input) AS (VALUES {", ".join(f"('{t}')" for t in SUGGEST_INPUTS)}),
vt AS (SELECT term, cf, {_D_TRI.format(c="term")} AS tri FROM stats),
qt AS (SELECT input, {_D_TRI.format(c="input")} AS tri FROM inp),
cand AS (
  SELECT input, term AS suggestion,
         levenshtein(input, term)::INTEGER AS distance, cf
  FROM vt CROSS JOIN qt
  WHERE len(list_intersect(vt.tri, qt.tri)) >= greatest(1, len(qt.tri) - 6)
    AND abs(length(term) - length(input)) <= 2
    AND levenshtein(input, term) <= 2 AND term <> input
)
SELECT input, suggestion, distance, cf, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY input ORDER BY distance ASC, cf DESC, suggestion ASC
  ) AS rank FROM cand
) WHERE rank <= 5
"""
    extra["dv_update_range"] = f"""
SELECT doc_id FROM (
  SELECT doc_id,
         CASE WHEN doc_id IN {DVU_IDS} THEN doc_id * 3 + 7
              ELSE n_chars END AS v
  FROM documents
) WHERE v BETWEEN 0 AND 45
"""
    _ps_vals = ", ".join(
        "({}, '{}', '{}')".format(i, *t.split()) for i, t in PS_QUERIES
    )
    extra["phrase_suggest"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
tok AS (SELECT unnest(toks) AS term FROM t),
uni AS (SELECT term, count(*)::BIGINT AS cf FROM tok GROUP BY 1),
tot AS (SELECT sum(cf)::DOUBLE AS total FROM uni),
big AS (
  SELECT s['w1'] AS w1, s['w2'] AS w2, count(*)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS s
    FROM t
  ) GROUP BY 1, 2
),
inp(query_id, t1, t2) AS (VALUES {_ps_vals}),
toks_in AS (
  SELECT DISTINCT input FROM (
    SELECT t1 AS input FROM inp UNION SELECT t2 FROM inp
  )
),
vt AS (SELECT term, cf, {_D_TRI.format(c="term")} AS tri FROM uni),
qt AS (SELECT input, {_D_TRI.format(c="input")} AS tri FROM toks_in),
cand AS (
  SELECT input, term AS suggestion,
         levenshtein(input, term)::INTEGER AS distance, cf
  FROM vt CROSS JOIN qt
  WHERE len(list_intersect(vt.tri, qt.tri)) >= greatest(1, len(qt.tri) - 3)
    AND abs(length(term) - length(input)) <= 1
    AND levenshtein(input, term) <= 1
),
c3 AS (
  SELECT input, suggestion, cf FROM (
    SELECT *, row_number() OVER (
      PARTITION BY input ORDER BY distance ASC, cf DESC, suggestion ASC
    ) AS r FROM cand
  ) WHERE r <= 3
),
-- engine fallback: a token with NO reachable candidate keeps itself
-- (necessarily OOV — in-vocab tokens self-suggest at distance 0), cf 0
cands AS (
  SELECT input, suggestion, cf FROM c3
  UNION ALL
  SELECT input, input AS suggestion, 0::BIGINT AS cf FROM toks_in
  WHERE input NOT IN (SELECT input FROM c3)
),
phr AS (
  SELECT i.query_id::BIGINT AS query_id,
         a.suggestion AS w1, a.cf AS cf1,
         b.suggestion AS w2, b.cf AS cf2
  FROM inp i JOIN cands a ON a.input = i.t1 JOIN cands b ON b.input = i.t2
),
scored AS (
  SELECT query_id, phr.w1 || ' ' || phr.w2 AS suggestion,
         round(
           ln((cf1 + 0.5) / tot.total)
           + CASE WHEN bg.c IS NOT NULL THEN ln(bg.c / cf1)
             ELSE ln(0.4 * (cf2 + 0.5) / tot.total) END, 6) AS score6
  FROM phr
  LEFT JOIN big bg ON bg.w1 = phr.w1 AND bg.w2 = phr.w2
  CROSS JOIN tot
)
SELECT query_id, suggestion, score6, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score6 DESC, suggestion ASC
  ) AS rank FROM scored
) WHERE rank <= 3
"""
    # Histogram facet: floor-bucketed n_chars over each query's top-10.
    extra["facet_histogram"] = _BM25_SQL_CTE + f"""
, top10 AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC
    ) AS rank FROM scored
  ) WHERE rank <= 10
)
SELECT t.query_id, floor(d.n_chars / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket_lo,
       count(*)::BIGINT AS n
FROM top10 t JOIN documents d ON t.doc_id = d.doc_id
GROUP BY 1, 2
"""
    # function_score: UNROUNDED bm25 sum × ln(1 + n_chars), then 6dp.
    extra["function_score"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS s
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
fs AS (
  SELECT s.query_id, s.doc_id, round(s.s * ln(1 + d.n_chars), 6) AS s6
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY s6 DESC, doc_id ASC
  ) AS rank FROM fs
) WHERE rank <= 10
"""
    extra["script_score"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS s
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
fs AS (
  SELECT s.query_id, s.doc_id,
         round(s.s * ln(1.0e0 + d.n_chars) / (1.0e0 + s.doc_id % 3), 6) AS s6
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY s6 DESC, doc_id ASC
  ) AS rank FROM fs
) WHERE rank <= 10
"""
    extra["rank_feature"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS s
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
fs AS (
  SELECT s.query_id, s.doc_id,
         round(s.s + 1.0 * (greatest(d.n_chars, 0)::DOUBLE
               / (greatest(d.n_chars, 0)::DOUBLE + {RF_PIVOT})), 6) AS s6
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY s6 DESC, doc_id ASC
  ) AS rank FROM fs
) WHERE rank <= 10
"""
    extra["decay_topk"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS s
  FROM qterms JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
fs AS (
  SELECT s.query_id, s.doc_id,
         round(s.s * (1.0 * exp(
           -(greatest(abs(d.n_chars - {DECAY_ORIGIN}) - 0.0, 0.0)
             * greatest(abs(d.n_chars - {DECAY_ORIGIN}) - 0.0, 0.0))
           / (2.0 * (-({DECAY_SCALE} * {DECAY_SCALE}) / (2.0 * ln(0.5))))
         )), 6) AS s6
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY s6 DESC, doc_id ASC
  ) AS rank FROM fs
) WHERE rank <= 10
"""
    # SynonymQuery blend: mapped tokens -> sum-tf / max-df pseudo-term;
    # unmapped tokens -> plain BM25 clause. One leg per clause.
    def _syn_leg(qid: int, tok: str) -> str:
        alts = SYN_MAP.get(tok)
        if not alts:
            return f"""
  SELECT {qid}::BIGINT AS query_id, tf.doc_id,
         ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf * ({K1} + 1.0)
         / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats WHERE tf.term = '{tok}'"""
        mem = ", ".join(f"'{t}'" for t in sorted({tok, *alts}))
        return f"""
  SELECT {qid}::BIGINT AS query_id, b.doc_id,
         ln(1 + (stats.n_docs - bd.dfb + 0.5) / (bd.dfb + 0.5))
         * b.tfb * ({K1} + 1.0)
         / (b.tfb + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS c
  FROM (SELECT doc_id, sum(tf)::BIGINT AS tfb FROM tf
        WHERE term IN ({mem}) GROUP BY 1) b
  CROSS JOIN (SELECT max(df)::BIGINT AS dfb FROM dfreq
              WHERE term IN ({mem})) bd
  JOIN dl ON b.doc_id = dl.doc_id CROSS JOIN stats"""

    _syn_legs = "\n  UNION ALL".join(
        _syn_leg(qid, tok)
        for qid, text in SYN_QUERIES
        for tok in text.split()
    )
    extra["synonym_topk"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS ({_syn_legs}
),
scored AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS s6
  FROM contrib GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id ORDER BY s6 DESC, doc_id ASC
  ) AS rank FROM scored
) WHERE rank <= 10
"""
    # match_phrase_prefix: lead words consecutive + any of the first
    # PP_MAX_EXP prefix expansions (term order) in the final slot.
    def _pp_leg(pp_id: int, text: str) -> str:
        toks = text.split()
        lead, m = toks[:-1], len(toks)
        conds = " AND ".join(
            f"toks[j + {i}] = '{w}'" for i, w in enumerate(lead)
        )
        last = f"list_contains(exp, toks[j + {m - 1}])"
        cond = f"{conds} AND {last}" if conds else last
        # DuckDB forbids subqueries inside lambdas: the one-row expansion
        # CTE cross-joins in so the lambda sees a plain `exp` column.
        return (
            f"  SELECT {pp_id}::BIGINT AS pp_id, doc_id,\n"
            f"         len(list_filter(range(1, len(toks) - {m - 1} + 1), "
            f"j -> {cond}))::BIGINT AS n_matches\n"
            f"  FROM t CROSS JOIN pp_e{pp_id}"
        )

    _pp_e = ",\n".join(
        f"pp_e{i} AS (SELECT list(term ORDER BY term) AS exp FROM ("
        f"SELECT DISTINCT term FROM tok WHERE starts_with(term, "
        f"'{t.split()[-1]}') ORDER BY term LIMIT {PP_MAX_EXP}) s)"
        for i, t in PP_QUERIES
    )
    extra["phrase_prefix"] = (
        f"WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),\n"
        f"tok AS (SELECT unnest({_D_TOKS}) AS term FROM documents),\n"
        + _pp_e
        + ",\nu AS (\n"
        + "\n  UNION ALL\n".join(_pp_leg(i, t) for i, t in PP_QUERIES)
        + "\n)\nSELECT pp_id, doc_id, n_matches FROM u WHERE n_matches > 0\n"
    )
    # Prefix completion: top-5 dictionary terms per prefix, (cf DESC,
    # term ASC) — the engine serves this from range-pruned slices of the
    # term-sorted dictionary; the oracle recomputes cf from the corpus.
    extra["complete"] = f"""
WITH tok AS (SELECT unnest({_TOKS_D}) AS term FROM documents),
stats AS (SELECT term, count(*)::BIGINT AS cf FROM tok GROUP BY 1),
inp(input) AS (VALUES {", ".join(f"('{p}')" for p in COMPLETE_PREFIXES)})
SELECT input, suggestion, cf, rank::INTEGER AS rank FROM (
  SELECT input, term AS suggestion, cf, row_number() OVER (
    PARTITION BY input ORDER BY cf DESC, term ASC
  ) AS rank
  FROM stats JOIN inp ON starts_with(stats.term, inp.input)
) WHERE rank <= 5
"""
    # MoreLikeThis: tf·idf term selection per seed + seed-excluded BM25.
    extra["more_like_this"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_TOKS_D})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
seeds(seed) AS (VALUES {", ".join(f"({s})" for s in MLT_SEEDS)}),
sel AS (
  SELECT seed, term FROM (
    SELECT s.seed, tf.term,
           row_number() OVER (PARTITION BY s.seed
             ORDER BY round(tf.tf * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)), 9) DESC,
               tf.term ASC) AS r
    FROM seeds s
    JOIN tf ON tf.doc_id = s.seed
    JOIN dfreq USING (term)
    CROSS JOIN stats
    WHERE dfreq.df >= {MLT_MIN_DF}
  ) WHERE r <= {MLT_MAX_TERMS}
),
scored AS (
  SELECT sel.seed AS query_id, tf.doc_id,
         round(sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ), 6) AS score6
  FROM sel JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id::BIGINT AS query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored WHERE doc_id <> query_id
) WHERE rank <= 10
"""
    # Filter context: FULL-corpus stats (unchanged scored CTE), non-member
    # docs dropped just before ranking — Lucene's filter clause.
    extra["bm25_topk_filtered"] = _BM25_SQL_CTE + f"""
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
  WHERE doc_id IN (SELECT doc_id FROM documents
                   WHERE lang IN ({", ".join(f"'{lang}'" for lang in FILTER_LANGS)}))
) WHERE rank <= 10
"""
    # Post-compaction: stats recomputed over live docs only — identical to
    # scoring a fresh build of the filtered corpus.
    extra["bm25_topk_deleted"] = base["bm25_topk"].replace(
        "FROM documents",
        f"FROM documents WHERE doc_id % {DELETE_PRED_MOD} <> {DELETE_PRED_REM}",
    )
    # Range filter context (doc-values sidecar): same scored CTE over the
    # range queries' scoring terms; the range predicate replays as a plain
    # WHERE over the documents metadata, applied just before ranking
    # (full-corpus stats — filter context semantics).
    rng_values = ", ".join(
        f"({i}, '{terms}')" for i, terms, _, _ in RANGE_QUERIES
    )
    rng_allow = "\nUNION ALL\n".join(
        f"SELECT {i}::BIGINT AS query_id, doc_id FROM documents WHERE {pred}"
        for i, _, _, pred in RANGE_QUERIES
    )
    extra["range_search"] = _BM25_SQL_CTE.replace(
        VALUES_QUERIES, rng_values
    ) + f"""
, allow AS ({rng_allow})
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored JOIN allow USING (query_id, doc_id)
) WHERE rank <= 10
"""
    # Sort-by-field: the boolean matches ordered by a metadata value
    # (ties on doc_id ascending), not relevance.
    extra["sort_by_meta"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
bq(bq_id, must, must_not) AS (VALUES {", ".join(
    "({}, [{}], {})".format(
        i,
        ",".join(f"'{w}'" for w in m.split()),
        "[" + ",".join(f"'{w}'" for w in n.split()) + "]" if n else "[]::VARCHAR[]",
    )
    for i, m, n in BOOL_QUERIES
)}),
m AS (
  SELECT bq_id::BIGINT AS bq_id, doc_id
  FROM t CROSS JOIN bq
  WHERE list_has_all(toks, must) AND NOT list_has_any(toks, must_not)
)
SELECT bq_id, doc_id, {SORT_FIELD}, rank::INTEGER AS rank FROM (
  SELECT m.bq_id, m.doc_id, d.{SORT_FIELD},
         row_number() OVER (PARTITION BY m.bq_id
                            ORDER BY d.{SORT_FIELD} ASC, m.doc_id ASC) AS rank
  FROM m JOIN documents d USING (doc_id)
) WHERE rank <= 10
"""
    # Boosted grammar: the BM25 CTE with a per-row boost factor and a
    # required-term eligibility check (a doc must contain every req=1
    # term of its query).
    bq_values = ", ".join(
        f"({qid}, '{t}', {b!r}::DOUBLE, {req})"
        for qid, elems in BOOST_ELEMS
        for t, b, req in elems
    )
    extra["search_boosted"] = f"""
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
q(query_id, term, boost, req) AS (VALUES {bq_values}),
scored AS (
  SELECT q.query_id::BIGINT AS query_id, tf.doc_id,
         round(sum(
           q.boost
           * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ), 6) AS score6
  FROM q
  JOIN tf USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
),
reqm AS (
  SELECT query_id::BIGINT AS query_id, count(DISTINCT term) AS m
  FROM q WHERE req = 1 GROUP BY 1
),
reqhit AS (
  SELECT q.query_id::BIGINT AS query_id, tf.doc_id,
         count(DISTINCT q.term) AS hit
  FROM q JOIN tf USING (term) WHERE q.req = 1 GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT s.query_id, s.doc_id,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score6 DESC, s.doc_id ASC) AS rank
  FROM scored s
  LEFT JOIN reqm USING (query_id)
  LEFT JOIN reqhit ON reqhit.query_id = s.query_id
                  AND reqhit.doc_id = s.doc_id
  WHERE coalesce(reqhit.hit, 0) >= coalesce(reqm.m, 0)
) WHERE rank <= 10
"""
    # ClassicSimilarity: the scored CTE with Lucene's TF-IDF formula —
    # sqrt(tf) · (1 + ln(N/(df+1)))² · 1/sqrt(dl) — in place of BM25.
    extra["tfidf_topk"] = f"""
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
stats AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         round(sum(
           pow(1.0 + ln(stats.n_docs / (dfreq.df + 1.0)), 2)
           * sqrt(tf.tf) / sqrt(dl.dl)
         ), 6) AS score6
  FROM qterms
  JOIN tf USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""
    _up_rows = "\n  UNION ALL ".join(
        f"SELECT {500 + j} AS doc_id, '{UPSERT_TEXT.format(k=f'k{k}')}' AS text"
        for j, k in enumerate(UPSERT_KEYS)
    )
    extra["upsert_topk"] = f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN {UPSERT_KEYS}
  UNION ALL {_up_rows}
),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '{TOK}')) AS term
  FROM base
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(coalesce(text, '')), '{TOK}'))::BIGINT AS dl
  FROM base
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
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""
    from dts.analysis import EN_STOPWORDS, en_light_analyze, stem_sql_duckdb

    _stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    _ana_values = ", ".join(
        f"({i}, '{en_light_analyze(t)}')" for i, t in PROBE_QUERIES
    )
    extra["stemmed_topk"] = f"""
WITH t0 AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '{TOK}') AS tk
  FROM documents
),
ana AS (
  SELECT doc_id,
         list_transform(
           list_filter(tk, t -> NOT list_contains([{_stop}], t)),
           t -> {stem_sql_duckdb('t')}) AS toks
  FROM t0
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM ana),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM ana),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
q(query_id, text) AS (VALUES {_ana_values}),
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
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""
    _pii_email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _pii_ipv4 = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
    _pii_phone = "\\+?\\d[\\d\\- ]{7,}\\d"
    extra["pii_scrub"] = """
WITH aug AS (
  SELECT doc_id,
         coalesce(text, '') || ' contact user' || doc_id::VARCHAR
         || '@example.com from 10.0.' || (doc_id % 256)::VARCHAR
         || '.7 call +1 555-000-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
           AS t
  FROM documents
),
s1 AS (
  SELECT doc_id, len(regexp_extract_all(t, '{e}'))::BIGINT AS n_email,
         regexp_replace(t, '{e}', '<EMAIL>', 'g') AS t
  FROM aug
),
s2 AS (
  SELECT doc_id, n_email, len(regexp_extract_all(t, '{i}'))::BIGINT AS n_ipv4,
         regexp_replace(t, '{i}', '<IP>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(t, '{p}'))::BIGINT AS n_phone,
         regexp_replace(t, '{p}', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, md5(t) AS clean_md5, n_email, n_ipv4, n_phone FROM s3
""".format(e=_pii_email, i=_pii_ipv4, p=_pii_phone)
    extra["dedup_spans"] = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, i.i - 1 AS pos,
         md5(array_to_string(toks[i.i : i.i + 5], ' ')) AS h
  FROM t, unnest(range(1, len(toks) - 4)) AS i(i)
),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
pos AS (
  SELECT t.doc_id, i.i - 1 AS p, toks[i.i] AS tok
  FROM t, unnest(range(1, len(toks) + 1)) AS i(i)
),
cov AS (
  SELECT DISTINCT g.doc_id, c.c AS p
  FROM g JOIN dup USING (h), unnest(range(g.pos, g.pos + 6)) AS c(c)
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
  WHERE cov.p IS NULL
),
clean AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY p) AS text_clean,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       md5(coalesce(c.text_clean, '')) AS clean_md5,
       len(t.toks)::BIGINT AS n_tokens,
       (len(t.toks) - coalesce(c.n_kept, 0))::BIGINT AS n_removed
FROM t LEFT JOIN clean c USING (doc_id)
"""
    extra["gopher_repetition"] = """
WITH docs0 AS (
  SELECT doc_id,
         replace(replace(coalesce(text, ''), ' table ', chr(10)),
                 ' row ', chr(10)||chr(10)) AS t
  FROM documents
),
base AS (
  SELECT doc_id,
         list_filter(string_split(t, chr(10)), x -> x <> '') AS lines,
         list_filter(string_split(t, chr(10)||chr(10)), x -> x <> '') AS paras,
         regexp_extract_all(lower(t), '[a-z0-9]+') AS toks
  FROM docs0
),
stats AS (
  SELECT doc_id,
         len(lines)::BIGINT AS n_lines,
         len(list_distinct(lines))::BIGINT AS nd_lines,
         coalesce(list_sum(list_transform(lines, x -> length(x))), 0)::BIGINT AS lc_all,
         coalesce(list_sum(list_transform(list_distinct(lines), x -> length(x))), 0)::BIGINT AS lc_dst,
         len(paras)::BIGINT AS n_paras,
         len(list_distinct(paras))::BIGINT AS nd_paras,
         coalesce(list_sum(list_transform(paras, x -> length(x))), 0)::BIGINT AS pc_all,
         coalesce(list_sum(list_transform(list_distinct(paras), x -> length(x))), 0)::BIGINT AS pc_dst,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS tokchars
  FROM base
),
grams AS (
  SELECT b.doc_id, nn.n, array_to_string(b.toks[i.i : i.i + nn.n - 1], ' ') AS gram
  FROM base b,
       unnest([2, 3, 4, 5, 10]) AS nn(n),
       unnest(range(1, len(b.toks) - nn.n + 2)) AS i(i)
),
gc AS (
  SELECT doc_id, n, gram, count(*)::BIGINT AS c,
         (length(gram) - (n - 1))::BIGINT AS chars
  FROM grams GROUP BY doc_id, n, gram
),
agg AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN c * chars END) AS top2,
         max(CASE WHEN n = 3 THEN c * chars END) AS top3,
         max(CASE WHEN n = 4 THEN c * chars END) AS top4,
         sum(CASE WHEN n = 5 AND c > 1 THEN (c - 1) * chars ELSE 0 END) AS dup5,
         sum(CASE WHEN n = 10 AND c > 1 THEN (c - 1) * chars ELSE 0 END) AS dup10
  FROM gc GROUP BY doc_id
)
SELECT s.doc_id,
       s.n_lines,
       round((s.n_lines - s.nd_lines) / greatest(s.n_lines, 1), 6) AS dup_line_frac6,
       round((s.lc_all - s.lc_dst) / greatest(s.lc_all, 1), 6) AS dup_line_char_frac6,
       s.n_paras,
       round((s.n_paras - s.nd_paras) / greatest(s.n_paras, 1), 6) AS dup_para_frac6,
       round((s.pc_all - s.pc_dst) / greatest(s.pc_all, 1), 6) AS dup_para_char_frac6,
       round(coalesce(a.top2, 0) / greatest(s.tokchars, 1), 6) AS top_2gram_char_frac6,
       round(coalesce(a.top3, 0) / greatest(s.tokchars, 1), 6) AS top_3gram_char_frac6,
       round(coalesce(a.top4, 0) / greatest(s.tokchars, 1), 6) AS top_4gram_char_frac6,
       round(coalesce(a.dup5, 0) / greatest(s.tokchars, 1), 6) AS dup_5gram_char_frac6,
       round(coalesce(a.dup10, 0) / greatest(s.tokchars, 1), 6) AS dup_10gram_char_frac6
FROM stats s LEFT JOIN agg a USING (doc_id)
"""
    _bqv = ", ".join(
        "({}, [{}], {})".format(
            i,
            ",".join(f"'{w}'" for w in m.split()),
            "[" + ",".join(f"'{w}'" for w in n.split()) + "]" if n else "[]::VARCHAR[]",
        )
        for i, m, n in BOOL_QUERIES
    )
    _bm_cte = f"""t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
bq(bq_id, must, must_not) AS (VALUES {_bqv}),
m AS (
  SELECT bq_id::BIGINT AS bq_id, doc_id
  FROM t CROSS JOIN bq
  WHERE list_has_all(toks, must) AND NOT list_has_any(toks, must_not)
)"""
    extra["facet_stats"] = f"""
WITH {_bm_cte}
SELECT m.bq_id,
       count(*)::BIGINT AS n,
       min(d.n_chars)::BIGINT AS min,
       max(d.n_chars)::BIGINT AS max,
       sum(d.n_chars)::BIGINT AS sum,
       round(sum(d.n_chars)::BIGINT / count(*), 6) AS avg6,
       CASE WHEN count(*) > 1 THEN round(
         (sum(d.n_chars * d.n_chars)::BIGINT
          - sum(d.n_chars)::BIGINT * sum(d.n_chars)::BIGINT / count(*))
         / (count(*) - 1), 6)
       ELSE 0.0 END AS var6
FROM m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY 1
"""
    _rvals = ", ".join(
        "('{}', {}, {})".format(
            lbl,
            "NULL::DOUBLE" if lo is None else f"{lo}::DOUBLE",
            "NULL::DOUBLE" if hi is None else f"{hi}::DOUBLE",
        )
        for lbl, lo, hi in FACET_RANGES
    )
    extra["facet_range"] = f"""
WITH {_bm_cte},
r(range_label, range_from, range_to) AS (VALUES {_rvals}),
keys AS (SELECT DISTINCT bq_id FROM m),
c AS (
  SELECT m.bq_id, r.range_label, count(*)::BIGINT AS n
  FROM m JOIN documents d USING (doc_id) CROSS JOIN r
  WHERE d.n_chars IS NOT NULL
    AND (r.range_from IS NULL OR d.n_chars >= r.range_from)
    AND (r.range_to IS NULL OR d.n_chars < r.range_to)
  GROUP BY 1, 2
)
SELECT k.bq_id, r.range_label, r.range_from, r.range_to,
       coalesce(c.n, 0)::BIGINT AS n
FROM keys k CROSS JOIN r
LEFT JOIN c ON c.bq_id = k.bq_id AND c.range_label = r.range_label
"""
    extra["facet_date_histogram"] = """
SELECT 'week' AS calendar_interval,
       strftime(date_trunc('week', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       count(*)::BIGINT AS n
FROM events WHERE ts IS NOT NULL GROUP BY 2
UNION ALL
SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
       count(*)::BIGINT
FROM events WHERE ts IS NOT NULL GROUP BY 2
"""
    # Pipeline aggs over the daily histogram: integer metric throughout;
    # the moving average is exact-int-sum ÷ row-count, rounded 6 dp.
    extra["pipeline_aggs"] = """
WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
         count(*)::BIGINT AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT bucket_ts, n,
       (n - lag(n, 1) OVER w)::BIGINT AS derivative,
       (sum(n) OVER (ORDER BY bucket_ts ROWS UNBOUNDED PRECEDING))::BIGINT AS cumulative_sum,
       round((sum(n) OVER (ORDER BY bucket_ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))::DOUBLE
             / (count(n) OVER (ORDER BY bucket_ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)), 6) AS moving_avg,
       (n - lag(n, 7) OVER w)::BIGINT AS serial_diff
FROM b WINDOW w AS (ORDER BY bucket_ts)
"""
    _ts_vals = ", ".join(
        f"({i}, '{t}')"
        for i, terms in TERMS_SET_QUERIES
        for t in sorted(set(terms.split()))
    )
    extra["terms_set"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents
),
dt AS (SELECT DISTINCT doc_id, term FROM tok),
q(tq_id, term) AS (VALUES {_ts_vals}),
c AS (
  SELECT tq_id::BIGINT AS tq_id, doc_id, count(*)::INTEGER AS n_matched
  FROM q JOIN dt USING (term) GROUP BY 1, 2
)
SELECT tq_id, doc_id, n_matched
FROM c JOIN documents d USING (doc_id)
WHERE n_matched >= greatest(1, ({TERMS_SET_MSM})::INTEGER)
"""
    extra["composite_page2"] = f"""
SELECT lang, (floor(n_chars / 200) * 200)::BIGINT AS chars_bin,
       count(*)::BIGINT AS doc_count
FROM documents
WHERE lang IS NOT NULL AND n_chars IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
LIMIT {COMPOSITE_SIZE} OFFSET {COMPOSITE_SIZE}
"""
    _fpred = " OR ".join(
        f"(nm.bucket = '{n}' AND ({p}))" for n, p in sorted(FACET_FILTERS.items())
    )
    _fnames = ", ".join(f"('{n}')" for n in sorted(FACET_FILTERS))
    extra["facet_filters"] = f"""
WITH {_bm_cte},
names(bucket) AS (VALUES {_fnames}),
keys AS (SELECT DISTINCT bq_id FROM m),
c AS (
  SELECT m.bq_id, nm.bucket, count(*)::BIGINT AS n
  FROM m JOIN documents d USING (doc_id) CROSS JOIN names nm
  WHERE {_fpred}
  GROUP BY 1, 2
)
SELECT k.bq_id, nm.bucket, coalesce(c.n, 0)::BIGINT AS n
FROM keys k CROSS JOIN names nm
LEFT JOIN c ON c.bq_id = k.bq_id AND c.bucket = nm.bucket
"""
    extra["sorted_fetch"] = """
WITH d AS (SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL)
SELECT 'asc' AS direction, doc_id, n_chars, rank::INTEGER AS rank FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rank FROM d
) WHERE rank <= 15
UNION ALL
SELECT 'desc', doc_id, n_chars, rank::INTEGER FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank FROM d
) WHERE rank <= 15
"""
    extra["match_bool_prefix"] = f"""
WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, len({_D_TOKS})::BIGINT AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
pre(query_id, p) AS (VALUES (0, 'jo'), (1, 'sc'), (2, 'da'), (3, 'zzqq')),
exp AS (
  SELECT query_id, term FROM (
    SELECT pre.query_id, v.term,
           row_number() OVER (PARTITION BY pre.query_id ORDER BY v.term ASC) AS r
    FROM pre JOIN (SELECT DISTINCT term FROM tok) v ON v.term LIKE pre.p || '%'
  ) WHERE r <= 50
),
qt AS (
  SELECT * FROM (VALUES (0, 'fast'), (1, 'table'), (3, 'fast')) q(query_id, term)
  UNION ALL
  SELECT query_id, term FROM exp
),
scored AS (
  SELECT qt.query_id::BIGINT AS query_id, tf.doc_id,
         round(sum(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ), 6) AS score6
  FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""
    extra["dedup_paragraphs"] = """
WITH t AS (
  SELECT doc_id, replace(coalesce(text, ''), ' table ', chr(10)) AS text
  FROM documents
),
l AS (
  SELECT doc_id, s.pos AS pos, s.line AS line FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, chr(10))) + 1),
             j -> struct_pack(pos := j, line := string_split(text, chr(10))[j]))) AS s
    FROM t)
),
c AS (
  SELECT line, count(*)::BIGINT AS c FROM l WHERE len(line) >= 15 GROUP BY 1
),
k AS (
  SELECT l.doc_id, l.pos, l.line,
         (len(l.line) >= 15 AND coalesce(c.c, 0) >= 2) AS rm
  FROM l LEFT JOIN c ON c.line = l.line
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT rm), '') AS text,
       (count(*) FILTER (WHERE rm))::BIGINT AS n_removed
FROM k GROUP BY 1
"""
    extra["blocklist"] = f"""
WITH t AS (SELECT doc_id, lang, {_D_TOKS} AS toks FROM documents)
SELECT doc_id, lang FROM t WHERE NOT list_has_any(toks, ['data', 'query'])
"""
    extra["weighted_avg"] = f"""
WITH {_bm_cte},
d AS (
  SELECT doc_id, n_chars, (doc_id % 5 + 1)::BIGINT AS w
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT m.bq_id, sum(d.n_chars * d.w)::DOUBLE / sum(d.w) AS weighted_avg
FROM m JOIN d USING (doc_id) GROUP BY 1
"""
    extra["bucket_extrema"] = """
WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
         count(*)::BIGINT AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
a AS (
  SELECT min(n)::BIGINT AS min_value, max(n)::BIGINT AS max_value,
         sum(n)::BIGINT AS sum_value,
         round(sum(n)::DOUBLE / count(n), 6) AS avg_value
  FROM b
)
SELECT a.min_value, a.max_value, a.sum_value, a.avg_value,
       (SELECT array_to_string(list_sort(list(bucket_ts)), ',') FROM b WHERE b.n = a.min_value) AS min_keys,
       (SELECT array_to_string(list_sort(list(bucket_ts)), ',') FROM b WHERE b.n = a.max_value) AS max_keys
FROM a
"""
    extra["gopher_quality"] = f"""
WITH t AS (SELECT doc_id, {GQ_TEXT.format(CHR="chr(10)")} AS text FROM documents),
w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS words,
         string_split(text, chr(10)) AS lines
  FROM t
),
m AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(words, x -> length(x))), 0)::BIGINT AS sl,
         (coalesce(list_sum(list_transform(words, x -> length(x) - length(replace(x, '#', '')))), 0)
          + len(regexp_extract_all(text, '(\\.\\.\\.|\u2026)')))::BIGINT AS sym,
         len(list_filter(lines, x -> regexp_matches(ltrim(x), '^[\u2022\\-\\*]')))::BIGINT AS nb,
         len(list_filter(lines, x -> regexp_matches(rtrim(x), '(\\.\\.\\.|\u2026)$')))::BIGINT AS ne,
         len(lines)::BIGINT AS nl,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS na,
         len(list_filter(['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'], s -> list_contains(list_transform(words, x -> lower(x)), s)))::BIGINT AS n_stopwords
  FROM w
),
r AS (
  SELECT doc_id, n_words,
         round(sl::DOUBLE / greatest(n_words, 1), 6) AS mean_word_len6,
         round(sym::DOUBLE / greatest(n_words, 1), 6) AS symbol_ratio6,
         round(nb::DOUBLE / nl, 6) AS bullet_frac6,
         round(ne::DOUBLE / nl, 6) AS ellipsis_frac6,
         round(na::DOUBLE / greatest(n_words, 1), 6) AS alpha_frac6,
         n_stopwords
  FROM m
)
SELECT *,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len6 >= 3.0 AND mean_word_len6 <= 10.0
        AND symbol_ratio6 <= 0.1 AND bullet_frac6 <= 0.9
        AND ellipsis_frac6 <= 0.3 AND alpha_frac6 >= 0.8
        AND n_stopwords >= 2) AS passes
FROM r
"""
    extra["lm_perplexity"] = f"""
WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
cfu AS (SELECT w, count(*)::BIGINT AS cf
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
tot AS (SELECT sum(cf)::DOUBLE AS total FROM cfu),
bg AS (
  SELECT s.prev AS prev, s.w AS w, count(*)::BIGINT AS bc FROM (
    SELECT unnest(list_transform(range(2, len(toks) + 1),
           j -> struct_pack(prev := toks[j - 1], w := toks[j]))) AS s
    FROM t WHERE len(toks) >= 2)
  GROUP BY 1, 2
),
p AS (
  SELECT doc_id, s.pos AS pos, s.w AS w, s.prev AS prev FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
           j -> struct_pack(pos := j, w := toks[j],
                            prev := CASE WHEN j > 1 THEN toks[j - 1] END))) AS s
    FROM t WHERE len(toks) >= 1)
),
lps AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN p.prev IS NULL
              THEN ln((coalesce(u.cf, 0) + 0.5) / (SELECT total FROM tot))
              WHEN b.bc IS NOT NULL THEN ln(b.bc / v.cf)
              ELSE ln({_LM_ALPHA} * (coalesce(u.cf, 0) + 0.5) / (SELECT total FROM tot))
         END AS lp
  FROM p
  LEFT JOIN cfu u ON u.w = p.w
  LEFT JOIN cfu v ON v.w = p.prev
  LEFT JOIN bg b ON b.prev = p.prev AND b.w = p.w
),
agg AS (
  SELECT doc_id, count(*)::INTEGER AS n_tokens,
         list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS logprob
  FROM lps GROUP BY 1
)
SELECT doc_id, n_tokens, round(logprob, 6) AS logprob6,
       round(exp(-logprob / n_tokens), 6) AS ppl6
FROM agg
"""
    extra["has_child"] = f"""
WITH k AS (
  SELECT l_orderkey AS o_orderkey, count(*)::BIGINT AS n_children,
         round(max(l_extendedprice), 6) AS child_score
  FROM lineitem WHERE {HAS_CHILD_PRED}
  GROUP BY 1 HAVING count(*) >= 2
)
SELECT o.o_orderkey, o.o_orderstatus, k.n_children, k.child_score
FROM orders o JOIN k USING (o_orderkey)
"""
    extra["has_parent"] = f"""
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE {HAS_PARENT_PRED})
"""
    extra["percentile_ranks"] = f"""
WITH {_bm_cte},
vals(value) AS (VALUES (200.0), (400.0), (800.0)),
j AS (
  SELECT m.bq_id, d.n_chars FROM m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
)
SELECT j.bq_id, v.value,
       round(100.0e0 * (sum(CASE WHEN j.n_chars <= v.value THEN 1 ELSE 0 END))::DOUBLE
             / count(*), 6) AS rank6
FROM j CROSS JOIN vals v
GROUP BY 1, 2
"""
    extra["adjacency_matrix"] = f"""
WITH {_bm_cte}
SELECT m.bq_id, 'en' AS bucket, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE ({FACET_FILTERS['en']}) AND ({FACET_FILTERS['en']}) GROUP BY 1
UNION ALL
SELECT m.bq_id, 'en&impossible' AS bucket, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE ({FACET_FILTERS['en']}) AND ({FACET_FILTERS['impossible']}) GROUP BY 1
UNION ALL
SELECT m.bq_id, 'en&short' AS bucket, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE ({FACET_FILTERS['en']}) AND ({FACET_FILTERS['short']}) GROUP BY 1
UNION ALL
SELECT m.bq_id, 'impossible' AS bucket, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE ({FACET_FILTERS['impossible']}) AND ({FACET_FILTERS['impossible']}) GROUP BY 1
UNION ALL
SELECT m.bq_id, 'impossible&short' AS bucket, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE ({FACET_FILTERS['impossible']}) AND ({FACET_FILTERS['short']}) GROUP BY 1
UNION ALL
SELECT m.bq_id, 'short' AS bucket, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE ({FACET_FILTERS['short']}) AND ({FACET_FILTERS['short']}) GROUP BY 1
"""
    extra["date_histogram_dense"] = """
WITH b AS (
  SELECT date_trunc('week', ts) AS w, count(*)::BIGINT AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
s AS (
  SELECT unnest(generate_series((SELECT min(w) FROM b),
                                (SELECT max(w) FROM b),
                                INTERVAL 1 WEEK)) AS w
)
SELECT strftime(s.w, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       coalesce(b.n, 0)::BIGINT AS n
FROM s LEFT JOIN b USING (w)
"""
    extra["geo_bbox"] = f"""
WITH geo AS (
  SELECT doc_id, {GEO_LAT} AS lat, {GEO_LON} AS lon FROM documents
)
SELECT doc_id, lat, lon FROM geo
WHERE lat >= -30.0 AND lat <= 30.0 AND lon >= -60.0 AND lon <= 60.0
"""
    extra["geo_distance"] = f"""
WITH geo AS (
  SELECT doc_id, {GEO_LAT} AS lat, {GEO_LON} AS lon FROM documents
),
d AS (
  SELECT doc_id,
         round(2.0 * 6371000.0 * asin(sqrt(
           pow(sin((radians(lat) - radians(10.0)) / 2), 2)
           + cos(radians(10.0)) * cos(radians(lat))
             * pow(sin((radians(lon) - radians(20.0)) / 2), 2)
         )), 3) AS dist3
  FROM geo
)
SELECT doc_id, dist3, rank::INTEGER AS rank FROM (
  SELECT doc_id, dist3,
         row_number() OVER (ORDER BY dist3 ASC, doc_id ASC) AS rank
  FROM d WHERE dist3 <= 3000000.0
) WHERE rank <= 15
"""
    extra["nested_match"] = """
SELECT l_orderkey AS o_orderkey, round(max(l_quantity), 6) AS nested_score
FROM lineitem
WHERE l_quantity >= 45 AND l_linenumber <= 2
GROUP BY 1
"""
    extra["rare_terms"] = f"""
WITH {_bm_cte},
c AS (
  SELECT m.bq_id, d.source, count(*)::BIGINT AS doc_count
  FROM m JOIN documents d USING (doc_id)
  WHERE d.source IS NOT NULL
  GROUP BY 1, 2
)
SELECT bq_id, source, doc_count FROM c WHERE doc_count <= 2
"""
    extra["multi_terms"] = f"""
WITH {_bm_cte}
SELECT m.bq_id, d.lang, d.source, count(*)::BIGINT AS doc_count
FROM m JOIN documents d USING (doc_id)
WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
GROUP BY 1, 2, 3
"""
    extra["facet_cardinality"] = f"""
WITH {_bm_cte}
SELECT m.bq_id, count(DISTINCT d.source)::BIGINT AS n_distinct
FROM m JOIN documents d USING (doc_id)
GROUP BY 1
"""
    extra["facet_percentiles"] = f"""
WITH {_bm_cte},
j AS (
  SELECT m.bq_id, d.n_chars
  FROM m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
)
SELECT bq_id, p::DOUBLE AS p, round(v::DOUBLE, 6) AS value6 FROM (
  SELECT bq_id, 0.5 AS p, quantile_cont(n_chars, 0.5) AS v FROM j GROUP BY 1
  UNION ALL
  SELECT bq_id, 0.9, quantile_cont(n_chars, 0.9) FROM j GROUP BY 1
  UNION ALL
  SELECT bq_id, 0.99, quantile_cont(n_chars, 0.99) FROM j GROUP BY 1
)
"""
    extra["lmd_topk"] = f"""
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
tot AS (SELECT count(*)::DOUBLE AS total_tokens FROM tok),
cfreq AS (SELECT term, count(*)::BIGINT AS cf FROM tok GROUP BY 1),
q(query_id, text) AS (VALUES {VALUES_QUERIES}),
qterms AS (SELECT query_id::BIGINT AS query_id, unnest(string_split(text, ' ')) AS term FROM q),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         round(sum(
           greatest(
             ln(1.0 + tf.tf / (2000.0 * (cfreq.cf / tot.total_tokens)))
             + ln(2000.0 / (dl.dl + 2000.0)),
             0.0)
         ), 6) AS score6
  FROM qterms
  JOIN tf USING (term)
  JOIN cfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT query_id, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""
    # Field collapsing: best round-6 hit per (query, source), survivors
    # re-ranked.
    extra["collapse_source"] = _BM25_SQL_CTE + f"""
, best AS (
  SELECT query_id, {COLLAPSE_FIELD}, doc_id, score6,
         row_number() OVER (PARTITION BY query_id, {COLLAPSE_FIELD}
                            ORDER BY score6 DESC, doc_id ASC) AS rn
  FROM scored JOIN documents USING (doc_id)
)
SELECT query_id, {COLLAPSE_FIELD}, doc_id, rank::INTEGER AS rank FROM (
  SELECT query_id, {COLLAPSE_FIELD}, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM best WHERE rn = 1
) WHERE rank <= 10
"""
    return {**base, **{k: v for k, v in extra.items() if v is not None}}
