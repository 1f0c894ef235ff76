"""Deterministic synthetic source-code corpus (FIXTURES.md §1, §3).

Plays the role of the reference's seeded random corpus generator
(reference src/test_generation.py:57-65 writes random `obj/<i>.txt` shards);
here the unit is a table row `(repo, path, commit, lang, content)` — the
shape mandated by BASELINE.json `input_hint`.

Token frequencies are Zipf-like so head terms (`def`, `import`, `return`,
`int`) dominate — this is what exercises the salted term-partitioned merge.
Everything is a pure function of (seed, n_docs): no timestamps, no machine
state. Edge-case rows mirroring the reference's `dna/` fixtures are always
appended (empty doc, 1-char doc, single-line doc, byte-identical duplicate
pair, head-term-only doc, non-ASCII doc).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = np.array(["py", "c", "cu", "java", "js", "md"])
LANG_W = np.array([0.35, 0.2, 0.1, 0.15, 0.1, 0.1])
EXT = {"py": "py", "c": "c", "cu": "cu", "java": "java", "js": "js", "md": "md"}

# Vocabulary: a few true head terms + a long tail of identifiers. The Zipf
# exponent keeps df('def') ~ corpus-wide while tail terms hit a handful of
# docs — the skew profile the salted merge is built for.
HEAD = ["def", "import", "return", "int", "for", "self", "if", "value", "data", "result"]
VOCAB_SIZE = 4000
ZIPF_S = 1.1

TEMPLATES = [
    "def {a}_{b}({c}, {d}):",
    "    return {a}.{b}({c}) + {d}",
    "import {a}.{b}",
    "for {a} in {b}.{c}():",
    "    {a} = {b}({c}, key={d})",
    "class {A}{B}:",
    "    # compute {a} over {b} with {c}",
    'print("{a} {b}", {c})',
    "{a}_{b} = [{c} for {c} in {d}]",
    "while {a} < {b}: {c} += {d}",
]


_SYLLABLES = [
    "ba", "con", "dex", "fil", "gra", "hash", "idx", "jor", "key", "lum",
    "map", "nod", "ora", "pix", "quer", "ran", "sto", "tra", "ume", "vec",
    "wal", "xen", "yam", "zon", "tab", "ser", "par", "mer", "lin", "deq",
]


def _vocab() -> np.ndarray:
    """HEAD terms + a tail of realistic varied-length identifiers (so edit
    distances between vocabulary terms are diverse — a degenerate `identN`
    vocabulary would put the whole vocab within distance 4 of itself and
    make fuzzy queries meaningless)."""
    rng = np.random.RandomState(1234)
    tail = set()
    while len(tail) < VOCAB_SIZE - len(HEAD):
        n = rng.randint(2, 6)
        w = "".join(_SYLLABLES[i] for i in rng.randint(0, len(_SYLLABLES), n))
        if w not in HEAD:
            tail.add(w)
    return np.array(HEAD + sorted(tail))


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    return p / p.sum()


def _edge_rows() -> list[dict]:
    big = "\n".join(
        TEMPLATES[i % len(TEMPLATES)].format(
            a=f"ident{i}", b=f"ident{i + 1}", c="value", d="data", A="Big", B=f"Dup{i}"
        )
        for i in range(400)
    )
    return [
        {"repo": "edge/empty", "path": "src/empty.py", "lang": "py", "content": ""},
        {"repo": "edge/onebyte", "path": "src/one.py", "lang": "py", "content": "T"},
        {
            "repo": "edge/line",
            "path": "src/line.py",
            "lang": "py",
            "content": "def singleLineFn(xs): return sorted(xs)[:10]",
        },
        {"repo": "edge/dup", "path": "src/a.py", "lang": "py", "content": big},
        {"repo": "edge/dup", "path": "src/b.py", "lang": "py", "content": big},
        {
            "repo": "edge/head",
            "path": "src/head.py",
            "lang": "py",
            "content": " ".join(["def import"] * 200),
        },
        {
            "repo": "edge/utf8",
            "path": "src/utf8.py",
            "lang": "py",
            "content": "def naïve_fn(données): return 'héllo 🎉' + str(données)",
        },
    ]


def make_corpus(n_docs: int = 200, seed: int = 42) -> pd.DataFrame:
    """Generate the source table as pandas: (repo, path, commit, lang, content).

    Deterministic in (n_docs, seed). ~75 tokens/doc average; content lines
    come from code templates with Zipf-sampled identifiers.
    """
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))

    n_lines = rng.randint(3, 40, size=n_docs)
    total_lines = int(n_lines.sum())
    tmpl_idx = rng.randint(0, len(TEMPLATES), size=total_lines)
    # 4 slots per line, sampled in one shot.
    words = vocab[rng.choice(len(vocab), size=(total_lines, 4), p=probs)]

    lines = [
        TEMPLATES[t].format(
            a=w[0], b=w[1], c=w[2], d=w[3], A=w[0].capitalize(), B=w[1].capitalize()
        )
        for t, w in zip(tmpl_idx, words)
    ]
    bounds = np.concatenate([[0], np.cumsum(n_lines)])
    contents = ["\n".join(lines[bounds[i] : bounds[i + 1]]) for i in range(n_docs)]

    lang = LANGS[rng.choice(len(LANGS), size=n_docs, p=LANG_W)]
    rows = pd.DataFrame(
        {
            "repo": [f"org{i % 7}/repo{i % 23}" for i in range(n_docs)],
            "path": [
                f"src/mod{i % 13}/file{i}.{EXT[lang[i]]}" for i in range(n_docs)
            ],
            "lang": lang,
            "content": contents,
        }
    )
    rows = pd.concat([rows, pd.DataFrame(_edge_rows())], ignore_index=True)
    rows["commit"] = [
        hashlib.sha256(f"{r}/{p}".encode()).hexdigest()[:40]
        for r, p in zip(rows["repo"], rows["path"])
    ]
    return rows[["repo", "path", "commit", "lang", "content"]]


def make_queries(n_queries: int = 120, seed: int = 42) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): exact terms, phrases, fuzzy terms.

    fuzzy_k ∈ {0,1,2,4} mirrors the reference's approx_factor sweep
    (reference src/test_generation.py:74,80 uses k ∈ {0,1,4}).
    """
    rng = np.random.RandomState(seed + 1)
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))
    rows = []
    for qid in range(n_queries):
        kind = qid % 3
        nt = 1 if kind == 0 else int(rng.randint(2, 4))
        terms = list(vocab[rng.choice(len(vocab), size=nt, p=probs)])
        fuzzy_k = 0
        if kind == 2:
            fuzzy_k = int(rng.choice([1, 2, 4]))
            # Mutate the first term with fuzzy_k seeded single-char edits.
            t = list(terms[0])
            for _ in range(fuzzy_k):
                op = rng.randint(3)
                pos = rng.randint(max(1, len(t)))
                ch = chr(ord("a") + rng.randint(26))
                if op == 0 and len(t) > 2:
                    del t[pos % len(t)]
                elif op == 1:
                    t.insert(pos, ch)
                elif t:
                    t[pos % len(t)] = ch
            terms[0] = "".join(t) or "x"
        rows.append(
            {
                "query_id": qid,
                "text": " ".join(terms),
                "fuzzy_k": fuzzy_k,
                "k": 10,
            }
        )
    return pd.DataFrame(rows)
