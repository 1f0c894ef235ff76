"""Code-aware tokenizer — the single source of truth.

The reference engine matches raw bytes (no tokens exist there, see
reference src/apm1.c:252-270); the north rule replaces byte windows with an
inverted index, which needs a deterministic tokenizer shared VERBATIM
between the Spark engine and the single-process oracle (rank identity
depends on it — FIXTURES.md §5).

Spec (applies to every ``lang``; per-lang comment/string stripping is a
deliberate non-goal for rank-identity simplicity):

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


def tokenize_text(text: str | None) -> list[str]:
    """Tokenize one string (oracle path). Identical spec to the UDF."""
    if not text:
        return []
    return [t.lower() for t in TOKEN_RE.findall(text)]


def tokenize_series(s: pd.Series) -> pd.Series:
    """Batch tokenize: Series[str] -> Series[list[str]] (lowercased)."""
    found = s.fillna("").str.findall(TOKEN_RE)
    return found.map(lambda toks: [t.lower() for t in toks])


def tokenize_exploded(s: pd.Series) -> pd.DataFrame:
    """Flat (index-build) form: one row per token, all ops C-level.

    Returns a DataFrame with columns ``pos`` (the input Series' positional
    index, int64), ``term`` (lowercased token) and ``toff`` (the token's
    0-based offset within its document — the positional-postings payload).
    Rows with zero tokens contribute nothing.
    """
    import numpy as np

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
