import pandas as pd

from dts.tokenizer import tokenize_exploded, tokenize_series, tokenize_text


def test_golden_cases():
    assert tokenize_text("parseHTTPResponse") == ["parse", "http", "response"]
    assert tokenize_text("snake_case_name") == ["snake", "case", "name"]
    assert tokenize_text("def f_1(x): return x+1") == [
        "def", "f", "1", "x", "return", "x", "1",
    ]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text("T") == ["t"]
    assert tokenize_text("CamelCase XMLHttpRequest") == [
        "camel", "case", "xml", "http", "request",
    ]
    assert tokenize_text("x86_64 0xFF") == ["x86", "64", "0", "x", "ff"]


def test_series_matches_scalar():
    texts = ["def foo_bar(x):", "", "HTTPServer2", None, "naïve données 🎉"]
    got = tokenize_series(pd.Series(texts, dtype="object")).tolist()
    want = [tokenize_text(t) for t in texts]
    assert got == want


def test_exploded_matches_series():
    texts = ["def foo(a, b)", "", "returnValue += x"]
    flat = tokenize_exploded(pd.Series(texts))
    want = []
    for i, t in enumerate(texts):
        want += [(i, tok) for tok in tokenize_text(t)]
    assert list(zip(flat["pos"], flat["term"])) == want


# --- comment/string-aware tokenization (SURVEY §2 O18, opt-in flag) --------


def test_strip_code_literals_golden_per_lang():
    from dts.tokenizer import strip_code_literals as strip

    def toks(text, lang):
        return tokenize_text(text, lang=lang, strip_literals=True)

    # python: line comment, single/double/triple-quoted strings, prefixes
    assert toks('x = "TODO in string"  # TODO comment\ntodo_real = 1', "py") == [
        "x", "todo", "real", "1",
    ]
    assert toks("s = '''multi\nline TODO'''\ny = 2", "py") == ["s", "y", "2"]
    assert toks('f = f"fmt {TODO}"\nr2 = r"raw\\TODO"', "py") == ["f", "r2"]
    # a real code-search pain point: "TODO" inside a literal is NOT a hit
    assert "todo" not in toks('msg = "TODO: fix later"', "py")

    # c/cu: block + line comments, strings, chars
    c_src = '/* TODO block */ int x = 1; // TODO line\nchar *s = "TODO"; char c = \'T\';'
    assert toks(c_src, "c") == ["int", "x", "1", "char", "s", "char", "c"]
    assert toks(c_src, "cu") == toks(c_src, "c")  # alias shares the table

    # java: same family
    assert toks('// TODO\nString s = "TODO"; int n = 3;', "java") == [
        "string", "s", "int", "n", "3",
    ]

    # js: template literals span lines
    assert toks("const t = `multi\nline ${TODO}`; let v = 4; // TODO", "js") == [
        "const", "t", "let", "v", "4",
    ]

    # md / unknown lang: identity (nothing stripped)
    assert toks("# heading TODO", "md") == ["heading", "todo"]
    assert strip("x # y", "md") == "x # y"
    assert strip("x # y", None) == "x # y"

    # comment-inside-string and string-inside-comment both resolve
    assert toks('a = "not // a comment"; b = 1; // "not a string" c', "js") == [
        "a", "b", "1",
    ]

    # unterminated literals stop at line end (strings) / EOF (blocks)
    assert toks('x = "unterminated\ny = 2', "py") == ["x", "y", "2"]
    assert toks("a = 1; /* runs to eof\nb = 2;", "c") == ["a", "1"]
    assert toks("t = `unterminated template\nz = 9", "js") == ["t"]


def test_strip_series_matches_scalar():
    from dts.tokenizer import strip_code_literals, strip_series

    texts = [
        'x = "s"  # c',
        "/* b */ int y; // l",
        "const z = `t`;",
        "# md heading",
        None,
        "plain words",
    ]
    langs = ["py", "c", "js", "md", "py", None]
    got = strip_series(
        pd.Series(texts, dtype="object"), pd.Series(langs, dtype="object")
    ).tolist()
    want = [strip_code_literals(t, g) or "" for t, g in zip(texts, langs)]
    assert got == want


def test_build_tf_strip_literals_rank_identity(spark):
    """End-to-end: an index built with strip_literals=True is rank-identical
    to the oracle fed PRE-STRIPPED content — the flag changes what both see,
    never how they tokenize (shared tokenizer by construction)."""
    from dts.index_build import build_index
    from dts.oracle import OracleIndex
    from dts.score_index import bm25_topk_indexed
    from dts.tokenizer import strip_code_literals

    rows = [
        (0, "py", 'def fetch_data():\n    # TODO fetch remote\n    return "remote data"'),
        (1, "c", '/* remote data handler */ int fetch_data() { return 0; } // remote'),
        (2, "js", "const remote = fetchData(`remote data`); // data"),
        (3, "md", "# remote data\nfetch data notes"),
        (4, "py", "remote = data = fetch = 1"),
    ]
    import tempfile

    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "content"])
    sdf = spark.createDataFrame(pdf)
    with tempfile.TemporaryDirectory() as d:
        idx = f"{d}/idx"
        meta = build_index(spark, sdf, idx, bucket_size=4, block_size=4,
                           strip_literals=True)
        assert meta["strip_literals"] is True
        oracle = OracleIndex(
            [(i, strip_code_literals(c, g)) for i, g, c in rows]
        )
        q = spark.createDataFrame(
            [(0, "remote data", 0), (1, "fetch", 1)],
            "query_id long, text string, fuzzy_k int",
        )
        got = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, idx, q, k=5).collect()
        )
        want = []
        for qid, text, k in [(0, "remote data", 0), (1, "fetch", 1)]:
            for rank, doc_id, score in oracle.score_query(text, k, 5):
                want.append((qid, rank, doc_id, score))
        assert got == sorted(want) and len(got) > 0
