"""Analysis chains (dts.analysis): Lucene EnglishMinimalStemmer parity,
stopword filter, column-vs-python mirror equality, and the analyzed
index end-to-end recall ("databases" query hits "database" docs)."""

from __future__ import annotations

import pytest

from dts.analysis import (
    EN_STOPWORDS,
    en_light_analyze,
    en_light_analyze_col,
    en_minimal_stem,
)


@pytest.mark.parametrize(
    "word,stem",
    [
        ("dogs", "dog"),          # default: drop final s
        ("cats", "cat"),
        ("berries", "berry"),     # -ies -> -y
        ("ties", "ty"),           # Lucene's minimal stemmer is minimal
        ("movies", "movy"),       # documented Lucene behavior
        ("houses", "house"),      # -ses -> -se via default branch
        ("glass", "glass"),       # penult s: unchanged
        ("bus", "bus"),           # penult u: unchanged
        ("goes", "goes"),         # -oes protected
        ("toes", "toes"),
        ("aies", "aies"),         # i preceded by a: protected
        ("is", "is"),             # len < 3
        ("s", "s"),
        ("items123s", "items123"),
        ("gas", "ga"),            # minimal means minimal
    ],
)
def test_en_minimal_stem_lucene_parity(word, stem):
    assert en_minimal_stem(word) == stem


def test_analyze_mirrors_column(spark, corpus_pd):
    sdf = spark.createDataFrame(corpus_pd.head(60)[["doc_id", "content"]])
    got = {
        int(r["doc_id"]): r["ana"]
        for r in sdf.select(
            "doc_id", en_light_analyze_col("content").alias("ana")
        ).collect()
    }
    for _, row in corpus_pd.head(60).iterrows():
        assert got[int(row["doc_id"])] == en_light_analyze(row["content"])


def test_analyze_drops_stopwords_and_restems_idempotently(spark):
    s = "The databases are holding their queries and berries"
    out = en_light_analyze(s)
    toks = out.split()
    assert "the" not in toks and "are" not in toks and "and" not in toks
    assert "database" in toks and "query" in toks and "berry" in toks
    # re-analyzing analyzed text is a fixpoint for this input — the
    # analyzed index's standard tokenizer reproduces the stream
    assert en_light_analyze(out) == out


def test_analyzed_index_end_to_end(spark, tmp_path):
    from dts.index_build import build_index
    from dts.score_index import bm25_topk_indexed
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (0, "the database holds a table"),
        (1, "databases hold tables"),       # plural forms
        (2, "nothing relevant whatsoever here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path / "ana_idx")
    build_index(
        spark, docs.withColumn("content", en_light_analyze_col("content")),
        d, bucket_size=16,
    )
    q = spark.createDataFrame(
        [(0, en_light_analyze("the databases"), 0)],
        "query_id long, text string, fuzzy_k int",
    )
    got = bm25_topk_indexed(spark, d, q, k=10).collect()
    ids = {int(r["doc_id"]) for r in got}
    assert ids == {0, 1}  # singular and plural docs both hit


def test_stop_set_is_lucene_default():
    assert len(EN_STOPWORDS) == 33 and "such" in EN_STOPWORDS
