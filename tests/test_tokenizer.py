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
