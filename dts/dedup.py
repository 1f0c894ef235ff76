"""Deduplication operators for large-scale training-data pipelines.

All hot paths are built-in Spark SQL functions (JVM, codegen) — shingling,
hashing, minhash, LSH banding AND simhash are array/string/bit
expressions, NOT Python. The only UDF left in this module is the numpy
simhash reference used by the differential test.

Cross-engine determinism: every hash is md5-hex (identical in Spark and
DuckDB), min/aggregation over hex STRINGS (lexicographic — consistent
everywhere), so each operator has an exact DuckDB oracle.

Operators:
- exact duplicate groups (content hash)
- token n-gram shingles + pairwise Jaccard near-dup pairs
- MinHash signatures + banded LSH candidate pairs (the scale path: no
  all-pairs join — candidates only within equal band buckets)
- SimHash (64-bit) fingerprints
- embedding-cosine near-duplicate pairs
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TOK = "[a-z0-9]+"


def tokens_col(text_col: str):
    """Simple regex tokens (lowercased) — shared with the DuckDB oracles."""
    return F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)")


def exact_canonical(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, content_md5, canonical_id): canonical = min doc_id among
    byte-identical texts. Window over the hash — at cluster scale this is a
    hash-partitioned shuffle, no skew beyond true duplicate group sizes."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    return docs.select("doc_id", h.alias("content_md5")).withColumn(
        "canonical_id",
        F.min("doc_id").over(Window.partitionBy("content_md5")),
    )


def dedup_corpus(
    docs: DataFrame,
    text_col: str = "text",
    method: str = "exact",
    **near_kwargs,
) -> DataFrame:
    """The END-TO-END dedup policy a training-data pipeline actually runs:
    return the CLEANED corpus — all columns of ``docs``, keeping only the
    canonical (minimum doc_id) member of each duplicate group; unique docs
    pass through untouched.

    ``method='exact'``: byte-identical groups (md5 hash-groupBy — the
    cheap first pass every pipeline runs). ``method='near'``:
    shingle-Jaccard clusters via dts.cluster.dup_clusters (near_kwargs:
    n, threshold, max_shingle_df, algorithm) — survivors are docs whose
    cluster_id equals their own id plus every unpaired doc. Both variants
    are deterministic (the keep-min rule, no sampling), so the output is
    reproducible and SQL-oracle-checkable."""
    if method == "exact":
        keep = exact_canonical(docs, text_col=text_col).filter(
            F.col("doc_id") == F.col("canonical_id")
        ).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi").select(*docs.columns)
    if method == "near":
        from dts.cluster import dup_clusters

        clusters = dup_clusters(docs, text_col=text_col, **near_kwargs)
        losers = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        return docs.join(losers, "doc_id", "left_anti").select(*docs.columns)
    raise ValueError(f"unknown dedup method {method!r}")


def shingle_col(text_col: str, n: int = 3):
    """Distinct token n-gram shingles as array<string> (built-in exprs)."""
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    return F.expr(
        f"""
        CASE WHEN size({toks}) < {n} THEN array(array_join({toks}, ' '))
        ELSE array_distinct(transform(
            sequence(0, size({toks}) - {n}),
            i -> concat_ws(' ', slice({toks}, i + 1, {n}))))
        END
        """
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingle_col(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(a, b, jac6) for doc pairs with shingle-Jaccard ≥ threshold; a < b.

    Exact pairwise via shingle inverted join — quadratic in the worst case;
    the LSH path below is the scale variant. ``max_shingle_df`` caps hot
    (boilerplate) shingles: shingles appearing in more than that many docs
    are dropped BEFORE the self-join (a df^2 blowup killer, analogous to
    the index's head-term handling), and Jaccard is then computed over the
    surviving informative-shingle universe — an approximation, default off
    so the exact probe semantics are unchanged."""
    sh = doc_shingles(docs, text_col, n)
    if max_shingle_df is not None:
        ok = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(ok, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn(
            "jac6",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jac6") >= threshold)
        .select("a", "b", "jac6")
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 16, n: int = 3
) -> DataFrame:
    """(doc_id, sig array<string>[n_hashes]): min_{s in shingles} md5(i:s).

    md5-hex min is deterministic and engine-portable (identical in DuckDB);
    at 10^12 scale you'd swap in a 64-bit xxhash for speed, same structure.

    Round-6 plan fix: tokens and shingles are STAGED PROJECTIONS, so the
    lambdas index cheap array attributes. The old single expression
    inlined the regexp tokenize into ``slice(toks, …)`` PER SHINGLE and
    the whole shingle subtree into the n_hashes transform — Spark does no
    subexpression elimination across lambda boundaries, so the corpus was
    re-tokenized O(dl · n_hashes) times per doc (the bigram_counts bug
    shape). Same values, same schema."""
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    sh = f"""
        CASE WHEN size(_mh_t) < {n} THEN array(array_join(_mh_t, ' '))
        ELSE array_distinct(transform(
            sequence(0, size(_mh_t) - {n}),
            i -> concat_ws(' ', slice(_mh_t, i + 1, {n}))))
        END
    """
    sig = f"""
        transform(sequence(0, {n_hashes - 1}),
                  i -> array_min(transform(_mh_sh, s -> md5(concat(cast(i as string), ':', s)))))
    """
    return (
        docs.select("doc_id", F.expr(toks).alias("_mh_t"))
        .select("doc_id", F.expr(sh).alias("_mh_sh"))
        .select("doc_id", F.expr(sig).alias("sig"))
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """(a, b, band) candidate pairs sharing one full LSH band.

    The scale path: signatures shuffle once on (band, band_key); buckets are
    tiny, so the pair join is local per bucket — no quadratic blowup."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, text_col, n_hashes, n)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {bands - 1}),
                          b -> struct(b AS band,
                                      array_join(slice(sig, b * {rows_per_band} + 1, {rows_per_band}), '|') AS key))
                """
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            "band",
        )
        .distinct()
    )


@F.pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over token md5s — the per-row reference used only by
    the differential pytest; the production path is the pure-JVM
    simhash_fingerprints below."""
    import hashlib
    import re

    tok_re = re.compile(TOK)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        toks = tok_re.findall(t.lower())
        if not toks:
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(w.encode()).digest()[:8] for w in set(toks)),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = bits.sum(0) * 2 - len(hs)
        sim = np.uint64(0)
        sim = (votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        out[i] = np.int64(np.bitwise_or.reduce(sim))
    return pd.Series(out)


# Little-endian u64 of the first 8 md5 bytes as a signed BIGINT, pure JVM:
# md5 hex chars [1..16] are bytes m0..m7; LE value = m0 | m1<<8 | … | m7<<56
# = lo32(m3 m2 m1 m0 as hex) | hi32(m7 m6 m5 m4) << 32. conv() parses each
# 32-bit half (< 2^32, so the BIGINT cast never overflows); the <<32 wraps
# into the sign bit exactly like numpy's int64 view. Matches DuckDB's
# md5_number_upper and the numpy packer in simhash64_udf bit-for-bit.
_MD5_LE64 = """
shiftleft(cast(conv(concat(substring(h,15,2),substring(h,13,2),
                           substring(h,11,2),substring(h,9,2)), 16, 10) as bigint), 32)
| cast(conv(concat(substring(h,7,2),substring(h,5,2),
                   substring(h,3,2),substring(h,1,2)), 16, 10) as bigint)
"""


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash, 100% JVM expressions (codegen) —
    explode distinct tokens, md5→u64 per term, per-bit ±1 vote aggregated
    by (doc_id, bit) (map-side combined: ≤ 64 rows per doc cross the
    shuffle), then bit_or-compose the signature. Zero Python in the plan;
    a corpus scan at 100 TB stays whole-stage-codegen."""
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(text_col))).alias("term")
    )
    hv = tok.select("doc_id", F.md5("term").alias("h")).select(
        "doc_id", F.expr(_MD5_LE64).alias("hv")
    )
    votes = (
        hv.select(
            "doc_id", "hv", F.explode(F.expr("sequence(0, 63)")).alias("b")
        )
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.expr("IF((shiftrightunsigned(hv, b) & 1) = 1, 1, -1)")
            ).alias("vote")
        )
    )
    sim = votes.groupBy("doc_id").agg(
        F.expr(
            "bit_or(IF(vote >= 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
        ).alias("simhash")
    )
    return (
        docs.select("doc_id")
        .join(sim, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def embedding_dup_pairs(emb: DataFrame, tau: float = 0.95) -> DataFrame:
    """(a, b, cos6): embedding pairs with cosine ≥ tau; exact pairwise
    (brute force) — the LSH/IVF variant lives in dts.similarity."""
    e = emb.select(
        F.col("vec_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    dot = F.expr(
        "aggregate(zip_with(x.v, y.v, (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)"
    )
    norm = "sqrt(aggregate(transform({0}, a -> a * a), cast(0.0 as double), (acc, z) -> acc + z))"
    return (
        e.alias("x")
        .join(e.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("a"),
            F.col("y.vec_id").alias("b"),
            F.round(
                dot / (F.expr(norm.format("x.v")) * F.expr(norm.format("y.v"))), 6
            ).alias("cos6"),
        )
        .filter(F.col("cos6") >= tau)
    )


def embedding_dup_pairs_ivf(
    emb: DataFrame,
    tau: float = 0.95,
    n_centroids: int = 16,
    seed: str = "ivfdup",
) -> DataFrame:
    """(a, b, cos6): near-duplicate embedding pairs with cosine ≥ tau,
    restricted to pairs whose vectors land in the SAME IVF cell — the
    scale path for embedding dedup. `embedding_dup_pairs` is an n²
    cross join; this is Σ|cell|² with ~√n-sized cells when n_centroids ≈
    √n, i.e. ~n^1.5 comparisons, and the join shuffles on the cell id
    the assignment already computed map-side (dts.similarity's
    zero-shuffle pandas-UDF argmax, deterministic md5-sampled centroids,
    round-6 half-away cosine + smallest-c_id tie-break — the same spec
    the DuckDB oracle recomputes exactly).

    Approximation is the standard IVF recall trade: a near-dup pair
    split across two cells is missed (true dups have cosine ≈ 1 and
    near-identical vectors, which land together unless they straddle a
    cell boundary). Skewed cells: bound with
    dts.similarity.split_hot_cells before calling if the embedding
    distribution is clustered."""
    from dts.similarity import _as_double, _ivf_centroids, ivf_assign_udf

    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    cents = _ivf_centroids(e, n_centroids, seed).collect()
    cent_ids = np.asarray([int(r["c_id"]) for r in cents], dtype=np.int64)
    cent_mat = np.asarray([r["c"] for r in cents], dtype=np.float64)
    assign = ivf_assign_udf(cent_ids, cent_mat)
    a = e.withColumn("c_id", assign(F.col("v")))
    dot = F.expr(
        "aggregate(zip_with(x.v, y.v, (p, q) -> p * q), cast(0.0 as double), (acc, z) -> acc + z)"
    )
    norm = "sqrt(aggregate(transform({0}, p -> p * p), cast(0.0 as double), (acc, z) -> acc + z))"
    return (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.c_id") == F.col("y.c_id"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("a"),
            F.col("y.vec_id").alias("b"),
            F.round(
                dot / (F.expr(norm.format("x.v")) * F.expr(norm.format("y.v"))),
                6,
            ).alias("cos6"),
        )
        .filter(F.col("cos6") >= tau)
    )


def winnow_col(text_col: str, k: int = 8, w: int = 4):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) as
    array<string>: md5 of each ORDERED token k-gram, then the distinct
    set of per-window minima over every w consecutive gram hashes.

    Guarantee: two docs sharing a contiguous run of ≥ k + w − 1 tokens
    share at least one selected fingerprint (the shared run contains a
    full hash window, identical in both docs, whose minimum both select).
    Docs shorter than k tokens fall back to one whole-text gram; gram
    sequences shorter than w collapse to a single whole-sequence window.
    100% JVM expressions, md5-portable to the DuckDB oracle.

    Round-6 plan fix: tokens and grams are LET-BOUND via the
    ``transform(array(x), v -> body)[0]`` idiom (a Column factory cannot
    stage projections), so each is evaluated ONCE per row instead of the
    old shape's re-tokenize per gram and re-hash of the whole gram list
    per window (no subexpression elimination across lambda boundaries —
    the bigram_counts bug shape). Same values, same schema."""
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    grams = (
        f"transform(sequence(0, size(t) - {k}),"
        f" i -> md5(concat_ws(' ', slice(t, i + 1, {k}))))"
    )
    return F.expr(
        f"""
        transform(array({toks}), t ->
          CASE WHEN size(t) < {k} THEN array(md5(array_join(t, ' ')))
          ELSE transform(array({grams}), g ->
                 array_distinct(transform(
                     sequence(1, greatest(size(g) - {w} + 1, 1)),
                     j -> array_min(slice(g, j, {w})))))[0]
          END)[0]
        """
    )


def winnow_fast_udf(k: int, w: int, text_col: str):
    """Arrow-vectorized winnowing fingerprints as array<long> — the SCALE
    path. The md5 expression chain in :func:`winnow_col` is the
    oracle-portable SPEC, but its per-window expression-tree evaluation
    (O(n·w) codegen'd string ops + an md5 per gram) measured ~25 min for
    one pass over 480k code files; this UDF does the same selection shape
    in numpy: Rabin-Karp polynomial gram hashes over per-batch-cached
    token hashes, window minima via a sliding view — O(n) C-level work
    per doc, one Arrow batch at a time, zero shuffle. Different hash ⇒
    different sampled fingerprints than the md5 spec (pair SETS for long
    shared runs are guaranteed either way: any verbatim run ≥ k + w − 1
    tokens contains a full window whose minimum both docs select), same
    determinism (blake2b-seeded token hashes, no process salt)."""
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    tok_re = re.compile(TOK)
    B = np.uint64(1099511628211)  # FNV prime as the polynomial base

    @pandas_udf("array<long>")
    def fps(texts: pd.Series) -> pd.Series:
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

        out = []
        with np.errstate(over="ignore"):
            for text in texts:
                toks = tok_re.findall((text or "").lower())
                if len(toks) < k:
                    whole = hashlib.blake2b(
                        " ".join(toks).encode(), digest_size=8
                    ).digest()
                    u = int.from_bytes(whole, "big")
                    out.append([u - 2 ** 64 if u >= 2 ** 63 else u])
                    continue
                hv = np.array([th(t) for t in toks], dtype=np.uint64)
                n_g = len(hv) - k + 1
                # polynomial gram hash g[i] = Σ_j hv[i+j]·B^(k-1-j),
                # built in k vectorized passes (Horner over the window)
                g = np.zeros(n_g, dtype=np.uint64)
                for j in range(k):
                    g = g * B + hv[j : j + n_g]
                if n_g <= w:
                    sel = np.array([g.min()], dtype=np.uint64)
                else:
                    sel = np.unique(
                        np.lib.stride_tricks.sliding_window_view(g, w).min(
                            axis=1
                        )
                    )
                out.append(sel.astype(np.int64).tolist())
        return pd.Series(out)

    return fps(F.col(text_col))


def winnowed_span_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 1,
    max_fp_df: int | None = None,
    text_col: str = "text",
    hash: str = "md5",
) -> DataFrame:
    """(a, b, n_shared): doc pairs sharing ≥ ``min_shared`` winnowing
    fingerprints — the exact-substring-duplication detector (Lee et al.
    "Deduplicating Training Data Makes Language Models Better" find
    ≥50-token verbatim spans; MOSS finds shared code). Any pair sharing
    a verbatim run of ≥ k + w − 1 tokens IS reported (winnow_col's
    guarantee); each selected fingerprint pins an exact shared k-gram.

    vs jaccard_pairs: that measures SET overlap of unordered shingles
    (near-duplicate whole docs); this detects contiguous verbatim spans
    inside otherwise-different docs — the copy-paste/boilerplate case —
    while sampling only ~1/((w+1)/2) of the grams, so the inverted join
    is w-fold cheaper at equal recall for long spans.

    Scale shape: fingerprints are map-side (zero shuffle); the pair join
    is the same df-capped inverted join as jaccard_pairs (``max_fp_df``
    drops boilerplate fingerprints before the self-join — the df² blowup
    killer; default off so probe semantics stay exact). ``hash``:
    ``"md5"`` (default) is the oracle-portable expression spec —
    probe-exact but O(n·w) string work per doc, measured ~25 min/pass on
    480k code files (killed unfinished at 25 min); ``"fast"`` is the
    production path (:func:`winnow_fast_udf`, numpy rolling hash —
    30.1 s for the same pass, ≥50×) with the same ≥ k+w−1-token span
    guarantee."""
    if hash == "fast":
        fcol = winnow_fast_udf(k, w, text_col)
    elif hash == "md5":
        fcol = winnow_col(text_col, k, w)
    else:
        raise ValueError(f"unknown hash {hash!r} (md5 | fast)")
    fp = docs.select("doc_id", F.explode(fcol).alias("fp"))
    if max_fp_df is not None:
        ok = (
            fp.groupBy("fp")
            .agg(F.count("*").alias("fdf"))
            .filter(F.col("fdf") <= max_fp_df)
            .select("fp")
        )
        fp = fp.join(ok, "fp")
    return (
        fp.alias("x")
        .join(fp.alias("y"), "fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def _all_gram_hash_udf(k: int, text_col: str):
    """ALL token k-gram hashes per doc as array<long> (position = array
    index) — the scale-path hasher for :func:`remove_duplicate_ngrams`:
    the same Rabin-Karp polynomial over blake2b token hashes as
    :func:`winnow_fast_udf` (measured there: the md5 expression chain is
    ~50× slower at 480k), minus the window-min sampling (removal needs
    every occurrence, not a sample)."""
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    tok_re = re.compile(TOK)
    B = np.uint64(1099511628211)

    @pandas_udf("array<long>")
    def gh(texts: pd.Series) -> pd.Series:
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

        out = []
        with np.errstate(over="ignore"):
            for text in texts:
                toks = tok_re.findall((text or "").lower())
                n_g = len(toks) - k + 1
                if n_g <= 0:
                    out.append([])
                    continue
                hv = np.array([th(t) for t in toks], dtype=np.uint64)
                g = np.zeros(n_g, dtype=np.uint64)
                for j in range(k):
                    g = g * B + hv[j : j + n_g]
                out.append(g.astype(np.int64).tolist())
        return pd.Series(out)

    return gh(F.col(text_col))


def remove_duplicate_ngrams(
    docs: DataFrame,
    k: int = 6,
    text_col: str = "text",
    min_count: int = 2,
    hash: str = "md5",
) -> DataFrame:
    """The REMOVAL stage of exact-substring training-data dedup (Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better"
    deduplicate-text-datasets: drop every duplicated ≥k-token span, not
    just whole near-dup documents): a token k-gram occurring ≥
    ``min_count`` times across the corpus (within-doc repeats count) is
    duplicate; every token covered by any duplicate-gram occurrence is
    removed; the doc is rebuilt from the surviving tokens. Returns
    (doc_id, text_clean, n_tokens, n_removed) — ``text_clean`` is the
    TOKEN-STREAM reconstruction (space-joined; the paper cuts raw bytes
    via suffix arrays — token k-grams are the standard distributed
    approximation, same spans at word granularity).

    Scale shape: gram hashing is map-side (``hash="md5"`` = the
    oracle-portable expression spec; ``"fast"`` = the numpy Rabin-Karp
    UDF — the winnowing measurement showed the md5 expression chain is
    ~50× slower at 480k docs, and unlike winnowing BOTH paths remove the
    same spans, since every gram is hashed and duplicate sets are
    content-determined — collisions aside, tested equal). The only
    corpus-scale shuffles are the gram-count hash agg (map-side
    combined) and the dup-occurrence semi-join — O(total tokens) rows,
    the same asymptotic work as the paper's suffix array, in two
    shuffles. Start positions regroup per doc (duplicate occurrences
    only, a small fraction) and the rebuild is one per-doc map pass."""
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    if hash == "md5":
        # Let-bind the tokenize (round-6: the old inline shape
        # re-tokenized per gram through the slice() lambda reference —
        # the bigram_counts bug shape). Same values.
        grams = F.expr(
            f"transform(array({toks}), t -> "
            f"CASE WHEN size(t) >= {k} THEN "
            f"transform(sequence(0, size(t) - {k}),"
            f" i -> md5(concat_ws(' ', slice(t, i + 1, {k}))))"
            f" ELSE array() END)[0]"
        ).cast("array<string>")
    elif hash == "fast":
        grams = _all_gram_hash_udf(k, text_col)
    else:
        raise ValueError(f"unknown hash {hash!r} (md5 | fast)")
    g = docs.select("doc_id", F.posexplode(grams).alias("pos", "h"))
    dup = (
        g.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= int(min_count))
        .select("h")
    )
    starts = (
        g.join(dup, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("starts"))
    )
    out = (
        docs.select("doc_id", F.expr(toks).alias("_t"))
        .join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce(F.col("starts"), F.array()))
    )
    kept = (
        f"filter(transform(_t, (t, i) -> struct(t AS t, i AS i)),"
        f" p -> NOT exists(starts, s -> s <= p.i AND p.i < s + {k}))"
    )
    return out.select(
        "doc_id",
        F.expr(f"concat_ws(' ', transform({kept}, p -> p.t))").alias(
            "text_clean"
        ),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.expr(f"size({kept})")).cast("long").alias("n_removed"),
    )


def contamination_pairs(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """(doc_id, bench_id, n_shared): corpus docs sharing ≥ ``min_shared``
    DISTINCT token n-grams with a benchmark/eval document — the
    decontamination primitive of a training-data pipeline (drop or flag
    training docs that leak eval content; n=8 is the
    common published contamination window, e.g. GPT-3 appendix C used
    13-grams, open replications typically 8–13).

    Scale shape: the benchmark side is CLIENT-sized by contract (an eval
    set) and broadcasts; the corpus side shingles map-side with the same
    100%-JVM n-gram exprs the dedup suite uses (array_distinct ⇒
    counting shared DISTINCT shingles is a plain count), so the whole op
    is one broadcast-join + hash agg over the corpus scan — no shuffle
    of the corpus. Docs shorter than ``n`` tokens fall back to a single
    whole-text shingle (shingle_col's documented behavior): they flag
    only against equally short identical bench texts."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    d = docs.select(
        "doc_id", F.explode(shingle_col(text_col, n)).alias("shingle")
    )
    b = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(shingle_col(bench_text_col, n)).alias("shingle"),
    )
    return (
        d.join(F.broadcast(b), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_paragraphs(
    docs: DataFrame,
    min_count: int = 2,
    min_line_chars: int = 15,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level exact LINE/PARAGRAPH deduplication — the RefinedWeb /
    MassiveText line-dedup stage (boilerplate nav bars, cookie banners,
    license headers repeat verbatim across millions of pages): any line
    of ≥ ``min_line_chars`` chars occurring ≥ ``min_count`` times
    CORPUS-WIDE (within-doc repeats count) is cut from EVERY document
    (all occurrences, like the exact-substring removal stage); docs are
    rebuilt from surviving lines in order. Short lines are never removed
    (the guard against nuking empty lines / list bullets).

    Returns (doc_id, text, n_removed). Plan: one split+posexplode pass →
    per-line hash agg (shuffle bounded by DISTINCT line count, map-side
    combined) → broadcast-or-shuffle join of the duplicated-line set →
    per-doc rebuild agg. No all-pairs, no corpus shuffle beyond the line
    counts."""
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    eligible = F.length("line") >= min_line_chars
    dups = (
        lines.filter(eligible)
        .groupBy("line")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("line", F.lit(True).alias("_dup"))
    )
    joined = lines.join(dups, "line", "left").withColumn(
        "_rm", eligible & F.coalesce(F.col("_dup"), F.lit(False))
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN NOT _rm "
                    "THEN struct(pos, line) END)), x -> x.line)"
                ),
                "\n",
            ).alias(text_col),
            F.sum(F.col("_rm").cast("long")).alias("n_removed"),
        )
    )
