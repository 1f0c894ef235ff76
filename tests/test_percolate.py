"""Percolation (reverse search) vs a python replay over the corpus."""

from __future__ import annotations

import pytest

from dts.oracle import phrase_count, sloppy_phrase_count
from dts.percolate import percolate
from dts.tokenizer import tokenize_text


def _replay(corpus_pd, queries):
    out = set()
    for _, row in corpus_pd.iterrows():
        d = int(row["doc_id"])
        toks = tokenize_text(row["content"])
        tset = set(toks)
        text = " ".join(toks)
        for qid, q in queries:
            must = [t[1:] for t in q.split() if t.startswith("+") and not t.startswith('+"')]
            nots = [t[1:] for t in q.split() if t.startswith("-")]
            import re

            phr = re.findall(r'"([^"]+)"(?:~(\d+))?', q)
            rest = re.sub(r'"[^"]+"(~\d+)?', " ", q).split()
            should = [t for t in rest if not t.startswith(("+", "-"))]
            if any(t in tset for t in nots):
                continue
            if any(t not in tset for t in must):
                continue
            if not must and should and not any(t in tset for t in should):
                continue
            ok = True
            for ph, sl in phr:
                slop = int(sl) if sl else 1
                n = (
                    sloppy_phrase_count(text, tokenize_text(ph), slop)
                    if slop > 1
                    else phrase_count(text, tokenize_text(ph))
                )
                if n == 0:
                    ok = False
            if not ok:
                continue
            if not must and not should and not phr:
                continue
            out.add((d, qid))
    return out


def test_percolate_vs_replay(spark, docs_sdf, corpus_pd):
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    u = tokenize_text(corpus_pd["content"].iloc[9])
    queries = [
        (0, f"{toks[0]} {u[1]}"),                  # OR
        (1, f"+{toks[0]} -{u[2]}"),                # MUST + NOT
        (2, f'"{toks[1]} {toks[2]}"'),             # exact phrase
        (3, f'+{toks[3]} "{u[0]} {u[1]}"~3'),      # must + sloppy phrase
        (4, "zzznope"),                            # matches nothing
    ]
    got = {
        (int(r["doc_id"]), int(r["query_id"]))
        for r in percolate(
            docs_sdf.withColumnRenamed("content", "content"), queries,
            text_col="content",
        ).collect()
    }
    want = _replay(corpus_pd, queries)
    assert got == want
    assert any(q == 2 for _, q in got)  # the phrase query fires somewhere


def test_percolate_validation_and_negation(spark, docs_sdf):
    with pytest.raises(ValueError, match="percolation supports"):
        percolate(docs_sdf, [(0, "quer*")], text_col="content").collect()
    # pure negation matches nothing (Lucene semantics)
    assert (
        percolate(docs_sdf, [(0, "-thing")], text_col="content").count() == 0
    )


def test_percolate_streaming(spark, corpus_pd, tmp_path):
    """percolate is a plain stateless transform: it runs unchanged under
    readStream (mapInPandas is streaming-compatible) — the alerting
    shape: new docs land, matched (doc, query) routes append."""
    land, ck, out = (str(tmp_path / p) for p in ("l", "c", "o"))
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    queries = [(0, f"+{toks[0]}"), (1, f'"{toks[1]} {toks[2]}"')]
    docs = corpus_pd.head(50)[["doc_id", "content"]]
    spark.createDataFrame(docs).coalesce(1).write.mode("append").parquet(land)
    schema = spark.createDataFrame(docs).schema
    stream = spark.readStream.schema(schema).parquet(land)
    q = (
        percolate(stream, queries, text_col="content")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (int(r["doc_id"]), int(r["query_id"]))
        for r in spark.read.parquet(out).collect()
    }
    want = _replay(docs, queries)
    assert got == want and len(got) > 0
