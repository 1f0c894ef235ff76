"""Did-you-mean term suggestions (Lucene's DirectSpellChecker shape).

For a query term that matched nothing (or a UI spell-assist), rank the
vocabulary's nearest terms by (edit distance ASC, collection frequency
DESC, term ASC) — closest first, popular first among equals, alphabetic
determinism last. Expansion reuses the engine's fuzzy machinery
(trigram-prefiltered banded Levenshtein), so suggestions carry exactly
the semantics fuzzy QUERIES use: a suggested term is precisely one a
``term~k`` query would reach.

Scale: candidate generation is the fuzzy path's (driver-local under the
vocab cap, distributed trigram join beyond); the cf ranking is a
broadcast join against term_stats. Input term lists are client-sized
(spell-assist batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from dts.io import local_rows_df

SUGGEST_SCHEMA = "input string, suggestion string, distance int, cf long, rank int"


def suggest_terms(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    max_k: int = 2,
    n: int = 5,
    include_exact: bool = False,
) -> DataFrame:
    """(input, suggestion, distance, cf, rank): up to ``n`` suggestions
    per input term within edit distance ``max_k``. An input already in
    the vocabulary suggests itself at distance 0 unless
    ``include_exact=False`` (the spell-check default: correct words need
    no correction, so they return no rows)."""
    from dts.fuzzy import expand_fuzzy_local, expand_fuzzy_terms
    from dts.index_build import load_meta
    from dts.oracle import banded_levenshtein
    from dts.score_index import (
        DRIVER_EXPAND_VOCAB_CAP,
        _driver_vocab,
        load_index,
    )

    meta = load_meta(index_dir)
    inputs = sorted({t.lower() for t in terms if t})
    if not inputs:
        return spark.createDataFrame([], SUGGEST_SCHEMA)
    pairs: list[tuple[str, str, int]] = []  # (input, suggestion, dist)
    if meta.get("vocab_size", 0) <= DRIVER_EXPAND_VOCAB_CAP:
        vocab = _driver_vocab(spark, index_dir, meta)
        exp = expand_fuzzy_local([(t, max_k) for t in inputs], vocab)
        for t in inputs:
            for cand in exp[(t, max_k)]:
                if cand == t and not include_exact:
                    continue
                pairs.append(
                    (t, cand, int(banded_levenshtein(t, cand, max_k)))
                )
    else:
        idx = load_index(spark, index_dir)
        fz = local_rows_df(
            spark,
            [(i, 0, t, max_k) for i, t in enumerate(inputs)],
            "query_id long, clause int, qterm string, fuzzy_k int",
        )
        rows = expand_fuzzy_terms(
            fz, idx["term_stats"].select("term"), idx.get("trigrams")
        ).collect()
        by_id = dict(enumerate(inputs))
        for r in rows:
            t, cand = by_id[int(r["query_id"])], r["term"]
            if cand == t and not include_exact:
                continue
            pairs.append((t, cand, int(banded_levenshtein(t, cand, max_k))))
    if not pairs:
        return spark.createDataFrame([], SUGGEST_SCHEMA)
    cand_df = local_rows_df(
        spark,
        pairs, "input string, suggestion string, distance int"
    )
    idx = load_index(spark, index_dir)
    stats = idx["term_stats"].select(
        F.col("term").alias("suggestion"), "cf"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("input").orderBy(
        F.col("distance").asc(), F.col("cf").desc(), F.col("suggestion").asc()
    )
    return (
        cand_df.join(stats, "suggestion")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("input", "suggestion", "distance", "cf", "rank")
    )


COMPLETE_SCHEMA = "input string, suggestion string, cf long, rank int"


def complete_prefix(
    spark: SparkSession,
    index_dir: str,
    prefixes: list[str],
    n: int = 5,
) -> DataFrame:
    """Prefix completion (Lucene suggest/completion shape): up to ``n``
    dictionary terms per input prefix, ranked (cf DESC, term ASC) —
    most-frequent first, alphabetic determinism among equals. The term
    itself completes its own prefix (Lucene includes exact hits).

    Returns (input, suggestion, cf, rank).

    Scale: each prefix becomes a RANGE predicate (term >= p AND
    term < next(p)) on the term-sorted dictionary parquet — row-group
    pruning turns a 10⁶-term dictionary scan into the matching slice;
    the per-input window ranks only that slice. Inputs are client-sized
    (an autocomplete batch). Lucene serves this from an FST; the
    analogue of its "weight" is collection frequency, the same signal
    DirectSpellChecker's popularity tiebreak uses above.
    """
    from dts.score_index import load_index
    from dts.wildcard import _prefix_upper

    inputs = sorted({p.lower() for p in prefixes if p})
    if not inputs:
        return spark.createDataFrame([], COMPLETE_SCHEMA)
    idx = load_index(spark, index_dir)
    stats = idx["term_stats"].select("term", "cf")
    parts = []
    for p in inputs:
        cond = F.col("term") >= p
        up = _prefix_upper(p)
        if up is not None:
            cond = cond & (F.col("term") < up)
        parts.append(stats.filter(cond).withColumn("input", F.lit(p)))
    cand = parts[0]
    for part in parts[1:]:
        cand = cand.unionByName(part)
    from pyspark.sql import Window

    w = Window.partitionBy("input").orderBy(
        F.col("cf").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(
            "input", F.col("term").alias("suggestion"), "cf", "rank"
        )
    )
