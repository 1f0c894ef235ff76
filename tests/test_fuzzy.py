

# ---------------------------------------------------------------------------
# OSA / restricted Damerau (Lucene FuzzyQuery transpositions=true)


def _osa_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost
            )
            if (
                i > 1 and j > 1
                and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def test_banded_osa_batch_vs_reference():
    import itertools

    import numpy as np

    from dts.fuzzy import banded_osa_batch

    words = ["", "a", "ab", "ba", "abc", "acb", "bac", "table", "tabel",
             "tble", "tables", "fast", "fats", "scan", "scna", "xyz"]
    pairs = list(itertools.product(words, words))
    for k in (0, 1, 2, 3):
        got = banded_osa_batch(
            np.array([a for a, _ in pairs], dtype=object),
            np.array([b for _, b in pairs], dtype=object),
            np.full(len(pairs), k, dtype=np.int64),
        )
        for (a, b), g in zip(pairs, got):
            ref = min(_osa_ref(a, b), k + 1)
            assert int(g) == ref, (a, b, k, int(g), ref)


def test_osa_vs_levenshtein_transposition_semantics():
    import numpy as np

    from dts.fuzzy import banded_lev_batch, banded_osa_batch

    # the Lucene default: an adjacent swap is ONE edit
    a = np.array(["tabel", "fats"], dtype=object)
    b = np.array(["table", "fast"], dtype=object)
    k = np.full(2, 2, dtype=np.int64)
    assert list(banded_osa_batch(a, b, k)) == [1, 1]
    assert list(banded_lev_batch(a, b, k)) == [2, 2]


def test_expand_fuzzy_osa_with_widened_floor():
    from dts.fuzzy import build_vocab_struct, expand_fuzzy_local, expand_fuzzy_osa

    vocab = build_vocab_struct(
        ["table", "tabel", "tables", "fast", "fats", "scan", "merge"]
    )
    # OSA k=1 finds the transposed form; plain Levenshtein k=1 does not
    osa = expand_fuzzy_osa([("tabel", 1)], vocab)[("tabel", 1)]
    lev = expand_fuzzy_local([("tabel", 1)], vocab)[("tabel", 1)]
    assert "table" in osa and "tabel" in osa
    assert "table" not in lev
    # exhaustive agreement with the reference on the whole vocab
    for q in ("table", "fsat", "scna", "mrege"):
        got = set(expand_fuzzy_osa([(q, 1)], vocab)[(q, 1)])
        want = {
            t for t in vocab["terms"] if _osa_ref(q, t) <= 1
        }
        assert got == want, q
