"""Document LM perplexity scoring — the CCNet quality-filter stage.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
language model trained on a clean reference corpus and keeps the
low-perplexity head — the single most-used model-based quality filter in
LLM-pretraining pipelines. This module is that stage on Spark, with the
engine's own bigram Stupid-Backoff LM (shared formula with
dts.phrasesuggest — Brants et al. 2007) standing in for KenLM:

    ln P(doc) = ln P(w_0) + Σ_i ln P(w_i | w_{i-1})
    P(w)      = (cf(w) + 0.5) / total        (0.5 floors unseen words)
    P(w|v)    = c(v,w) / cf(v)               when the bigram was seen
              = alpha · (cf(w)+0.5) / total  otherwise (backoff)
    ppl(doc)  = exp(− ln P(doc) / n_tokens)

The LM side (``bigrams``, ``unigrams``) can come from ANY corpus — train
on the clean reference, score the crawl (the CCNet setup) — or from the
scored corpus itself (self-perplexity, a contamination/outlier signal).

Scale shape: LM training is one tokenize pass + two hash aggs (the same
cost class as index term stats). Scoring explodes (doc_id, pos, w, prev)
straight from the token ARRAY expression — ``prev`` is ``toks[pos]``
computed in the same select, NO per-doc window/sort — then three hash
joins against the LM tables (vocabulary-sized: broadcast at probe scale,
shuffle-on-token beyond) and one hash agg per doc.

Cross-engine exactness: per-doc log-prob is a LEFT FOLD over the
position-sorted lp list (Spark ``aggregate`` with 0.0 seed ≡ DuckDB
``list_reduce`` — both strictly left-to-right; +0.0 on the first element
is exact), so the many-addend float sum is deterministic on BOTH
engines — the trick that makes a whole-document float reduction
hash-comparable when plain SUM() is association-unsafe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dts.phrasesuggest import ALPHA, TOK, bigram_counts

LM_SCHEMA = "doc_id long, n_tokens int, logprob6 double, ppl6 double"


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cf): token frequencies over the LM corpus — one scan, one
    partial+final hash agg, 100% JVM."""
    toks = f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    return (
        docs.select(F.explode(F.expr(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cf"))
    )


def doc_lm_perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    text_col: str = "text",
    alpha: float = ALPHA,
    broadcast_lm: bool | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, logprob6, ppl6) for every doc with ≥ 1 token.
    ``bigrams`` from :func:`dts.phrasesuggest.bigram_counts`; ``unigrams``
    from :func:`unigram_counts` (over the LM corpus, not necessarily the
    scored one). ``broadcast_lm``: force/forbid broadcasting the LM
    tables; default lets AQE decide (LM tables are vocabulary-sized).

    Filter usage (CCNet): keep ``ppl6 <= threshold`` — the threshold is a
    corpus quantile of ppl6 (``facet_percentiles``/``approx_percentile``
    give it in one extra agg).

    Plan shape (round-6): the corpus total rides as a broadcast 1-row
    cross join instead of a driver collect, so the whole score is ONE
    action — the old shape's eager ``total`` collect recomputed the
    unigram tokenize+agg lineage once for the collect and twice more for
    the uni/vtot join sides (uncached inputs). In one plan, Spark's
    ReuseExchange shares the unigram aggregation shuffle between uni,
    vtot and the total, cutting the LM-side tokenize passes 4 → 1."""
    tot = unigrams.agg(F.sum("cf").alias("_tot"))
    total = F.coalesce(F.col("_tot"), F.lit(1)).cast("double")

    def _side(df: DataFrame) -> DataFrame:
        if broadcast_lm is True:
            return F.broadcast(df)
        return df

    toks = F.expr(
        f"regexp_extract_all(lower(coalesce({text_col}, '')), '{TOK}', 0)"
    )
    w = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            "toks",
            F.posexplode("toks").alias("pos", "w"),
        )
        .select(
            "doc_id",
            "pos",
            "w",
            # prev = toks[pos] (element_at is 1-based; pos is 0-based) —
            # computed from the carried array, no window/sort.
            F.when(
                F.col("pos") >= 1, F.element_at("toks", F.col("pos"))
            ).alias("prev"),
        )
    )
    uni = _side(
        unigrams.select(F.col("w"), F.col("cf").alias("cfw"))
    )
    vtot = _side(
        unigrams.select(
            F.col("w").alias("prev"), F.col("cf").alias("cfprev")
        )
    )
    bg = _side(
        bigrams.select(
            F.col("w1").alias("prev"),
            F.col("w2").alias("w"),
            F.col("c").alias("bc"),
        )
    )
    j = (
        w.join(uni, "w", "left")
        .join(vtot, "prev", "left")
        .join(bg, ["prev", "w"], "left")
        .crossJoin(F.broadcast(tot))
    )
    # Shared formula with dts.phrasesuggest.suggest_phrases (one LM, two
    # consumers): unigram floor cf+0.5; Stupid Backoff for unseen bigrams.
    lp = F.when(
        F.col("prev").isNull(),
        F.log(
            (F.coalesce(F.col("cfw"), F.lit(0)) + F.lit(0.5)) / total
        ),
    ).otherwise(
        F.when(
            # round-5 ADVICE: cross-corpus LM tables may carry a bigram
            # whose w1 has no unigram row; a null cfprev must fall
            # through to the backoff term instead of nulling the whole
            # doc's left-fold logprob. (Same-corpus tables — every
            # declared probe — always have cfprev for seen bigrams.)
            F.col("bc").isNotNull() & F.col("cfprev").isNotNull(),
            F.log(F.col("bc") / F.col("cfprev")),
        ).otherwise(
            F.log(
                F.lit(float(alpha))
                * (F.coalesce(F.col("cfw"), F.lit(0)) + F.lit(0.5))
                / total
            )
        )
    )
    per_doc = (
        j.withColumn("lp", lp)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lp"))),
                    lambda x: x["lp"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("logprob"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round("logprob", 6).alias("logprob6"),
        F.round(
            F.exp(-F.col("logprob") / F.col("n_tokens")), 6
        ).alias("ppl6"),
    )
