"""Code-aware tokenizer — the single source of truth.

The reference engine matches raw bytes (no tokens exist there, see
reference src/apm1.c:252-270); the north rule replaces byte windows with an
inverted index, which needs a deterministic tokenizer shared VERBATIM
between the Spark engine and the single-process oracle (rank identity
depends on it — FIXTURES.md §5).

Spec (applies to every ``lang``; per-lang comment/string stripping is
available OPT-IN via ``strip_literals=True`` — see strip_code_literals —
and is off by default so the default index is byte-complete):

1. Raw lexemes are maximal runs matched by ``TOKEN_RE`` over the raw
   content. ``_`` is NOT in any character class, so ``snake_case`` splits
   into ``snake``, ``case`` for free; operators/punctuation never tokenize.
2. camelCase / PascalCase / UPPERCASE-acronym boundaries split:
   ``parseHTTPResponse`` → ``parse``, ``http``, ``response``.
3. Tokens lowercased. Pure digit runs kept as-is.
4. ``None``/empty content → empty token list.

The case distinction drives the splits, so matching runs on the ORIGINAL
text and lowercasing happens after. Batch functions use pandas C-level
string ops (findall / explode / str.lower); the only Python-level work is
the list comprehension pandas needs to build list cells.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Alternation order matters: acronym run (not followed by lowercase) |
# Capitalized word | lowercase word | digit run.
TOKEN_PATTERN = r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z][a-z0-9]*|[0-9]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)


# --- per-lang comment/string stripping (SURVEY §2 O18) ---------------------
#
# Each lang maps to an ORDERED list of regex alternatives compiled into one
# alternation. re.sub scans left-to-right and the first alternative matching
# at a position consumes it, which resolves comment-inside-string and
# string-inside-comment correctly without a char-level scanner (the classic
# lexer-by-alternation trick) — and the regex engine is C, so a strip pass
# costs about as much as the tokenize findall itself. Unterminated
# strings/comments match to line end / EOF instead of leaking the rest of
# the file into "code". Aliases (cu→c, ts→js, …) share tables.
_DQ_STR = r'"(?:\\.|[^"\\\n])*(?:"|(?=\n)|$)'  # double-quoted, one line
_SQ_STR = r"'(?:\\.|[^'\\\n])*(?:'|(?=\n)|$)"  # single-quoted, one line
_BLOCK_COMMENT = r"/\*[\s\S]*?(?:\*/|$)"
_LINE_COMMENT = r"//[^\n]*"
_C_FAMILY = [_DQ_STR, _SQ_STR, _BLOCK_COMMENT, _LINE_COMMENT]
_LANG_STRIP_RULES: dict[str, list[str]] = {
    "py": [
        # triple-quoted first (else ''' parses as empty '' + dangling ');
        # no capture groups anywhere — rules are joined into one alternation
        r"(?:[rRbBuUfF]{1,3})?'''[\s\S]*?(?:'''|$)",
        r'(?:[rRbBuUfF]{1,3})?"""[\s\S]*?(?:"""|$)',
        r"(?:[rRbBuUfF]{1,3})?" + _DQ_STR,
        r"(?:[rRbBuUfF]{1,3})?" + _SQ_STR,
        r"#[^\n]*",
    ],
    "c": _C_FAMILY,
    "java": _C_FAMILY,
    "js": [_DQ_STR, _SQ_STR, r"`(?:\\.|[^`\\])*(?:`|$)"] + [_BLOCK_COMMENT, _LINE_COMMENT],
    "go": [_DQ_STR, _SQ_STR, r"`[^`]*(?:`|$)"] + [_BLOCK_COMMENT, _LINE_COMMENT],
    "rust": _C_FAMILY,  # approximation: nested block comments end at first */
    "sql": [_SQ_STR, r"--[^\n]*", _BLOCK_COMMENT],
    "sh": [_DQ_STR, _SQ_STR, r"#[^\n]*"],
    # md and unknown langs: no code literals to strip (identity).
}
_LANG_ALIASES = {
    "cu": "c", "cpp": "c", "cc": "c", "h": "c", "hpp": "c",
    "ts": "js", "jsx": "js", "tsx": "js",
    "python": "py", "bash": "sh", "golang": "go", "rs": "rust",
}
_STRIP_RE_CACHE: dict[str, re.Pattern | None] = {}


def _strip_re(lang: str | None) -> re.Pattern | None:
    key = _LANG_ALIASES.get(lang, lang) if lang else None
    if key not in _STRIP_RE_CACHE:
        rules = _LANG_STRIP_RULES.get(key)
        _STRIP_RE_CACHE[key] = (
            re.compile("|".join(rules)) if rules else None
        )
    return _STRIP_RE_CACHE[key]


def strip_code_literals(text: str | None, lang: str | None) -> str:
    """Replace string literals and comments with a space, per ``lang``.

    Unknown/None langs (and e.g. md) are returned unchanged. Shared by the
    engine (build_tf(strip_literals=True)) and the oracle, so rank identity
    is preserved by construction whichever way the flag is set."""
    if not text:
        return text or ""
    rx = _strip_re(lang)
    return rx.sub(" ", text) if rx is not None else text


def strip_series(s: pd.Series, langs: pd.Series) -> pd.Series:
    """Batch strip: group rows by lang so each lang is ONE C-level
    str.replace pass over its subset instead of per-row Python."""
    out = s.fillna("")  # fresh Series — in-place masked assignment is safe
    for lang in langs.dropna().unique():
        rx = _strip_re(lang)
        if rx is None:
            continue
        mask = (langs == lang).to_numpy()
        out[mask] = out[mask].str.replace(rx, " ", regex=True)
    return out


def tokenize_text(
    text: str | None, lang: str | None = None, strip_literals: bool = False
) -> list[str]:
    """Tokenize one string (oracle path). Identical spec to the UDF."""
    if not text:
        return []
    if strip_literals:
        text = strip_code_literals(text, lang)
    return [t.lower() for t in TOKEN_RE.findall(text)]


def tokenize_series(
    s: pd.Series, langs: pd.Series | None = None, strip_literals: bool = False
) -> pd.Series:
    """Batch tokenize: Series[str] -> Series[list[str]] (lowercased)."""
    if strip_literals and langs is not None:
        s = strip_series(s, langs)
    found = s.fillna("").str.findall(TOKEN_RE)
    return found.map(lambda toks: [t.lower() for t in toks])


def tokenize_exploded(
    s: pd.Series, langs: pd.Series | None = None, strip_literals: bool = False
) -> pd.DataFrame:
    """Flat (index-build) form: one row per token, all ops C-level.

    Returns a DataFrame with columns ``pos`` (the input Series' positional
    index, int64), ``term`` (lowercased token) and ``toff`` (the token's
    0-based offset within its document — the positional-postings payload).
    Rows with zero tokens contribute nothing.
    """
    import numpy as np

    if strip_literals and langs is not None:
        s = strip_series(s, langs)
    found = s.fillna("").str.findall(TOKEN_RE)
    found.index = pd.RangeIndex(len(found))
    flat = found.explode().dropna()
    pos = flat.index.to_numpy("int64")
    # Token offset within doc: explode preserves order, so within each pos
    # run the offset is arange from the run start.
    starts = np.flatnonzero(np.concatenate(([True], pos[1:] != pos[:-1])))
    run_len = np.diff(np.concatenate((starts, [len(pos)])))
    toff = np.arange(len(pos), dtype="int64") - np.repeat(starts, run_len)
    return pd.DataFrame(
        {"pos": pos, "term": flat.str.lower().to_numpy(), "toff": toff}
    )


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(content: pd.Series) -> pd.Series:
    """array<string> tokenizer for DataFrame pipelines."""
    return tokenize_series(content)
