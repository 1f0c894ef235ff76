"""Percolation — reverse search (ES percolator / Lucene MemoryIndex).

Register CLIENT-sized query strings once; stream DOCUMENTS against them
and get (doc_id, query_id) matches — the alerting/routing primitive of
a training-data pipeline ("which collection rules does this new crawl
doc trigger?"). The data flow is inverted from search: documents are
the big side, queries the broadcast side.

Spark shape: ONE mapInPandas over the documents — no shuffle at all;
each batch tokenizes with the shared engine tokenizer and evaluates the
registered queries with set/position algebra. Candidate pruning keeps
the per-doc work proportional to the queries that COULD match: an
inverted map trigger-term → queries means only queries sharing ≥1
positive term with the doc are evaluated (ES indexes query terms for
the same reason); match-all-shaped queries (no positive terms) are
evaluated unconditionally.

Supported grammar (dts.parser.parse_query subset): bare terms (OR — at
least one must appear when no ``+`` clause exists, Lucene BooleanQuery
default), ``+term`` MUST, ``-term`` MUST_NOT, quoted phrases
(consecutive-token containment, ``"a b"~k`` per-gap slop) and negated
phrases. Wildcard/fuzzy/field/range atoms raise — percolation has no
index to expand them against.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from dts.oracle import phrase_count, sloppy_phrase_count
from dts.parser import parse_query
from dts.tokenizer import tokenize_text

PERC_SCHEMA = "doc_id long, query_id long"


def compile_queries(queries: list[tuple[int, str]]):
    """Parse + validate registered queries. Returns (compiled list,
    trigger-term → query-index inverted map, unconditional indexes)."""
    compiled = []
    for qid, text in queries:
        p = parse_query(text)
        if (
            p.fuzzy or p.wildcards or p.must_fuzzy or p.not_fuzzy
            or p.must_wildcards or p.not_wildcards or p.ranges
            or p.not_ranges or p.fielded
        ):
            raise ValueError(
                f"percolation supports terms/+/-/phrases only "
                f"(query_id={qid}): wildcard/fuzzy/field/range atoms "
                "need an index to expand against"
            )
        compiled.append(
            (
                int(qid),
                sorted(set(p.score_terms)),
                sorted(set(p.must)),
                sorted(set(p.must_not)),
                [
                    (tokenize_text(ph), int(sl))
                    for ph, sl in zip(p.phrases, p.phrase_slops)
                ],
                [
                    (tokenize_text(ph), int(sl))
                    for ph, sl in zip(p.not_phrases, p.not_phrase_slops)
                ],
            )
        )
    trigger: dict[str, list[int]] = {}
    unconditional: list[int] = []
    for i, (_, should, must, _, phrases, _) in enumerate(compiled):
        pos = set(should) | set(must) | {
            t for toks, _ in phrases for t in toks
        }
        if not pos:
            unconditional.append(i)
            continue
        for t in pos:
            trigger.setdefault(t, []).append(i)
    return compiled, trigger, unconditional


def _matches(doc_toks: list[str], doc_set: set[str], cq) -> bool:
    _, should, must, must_not, phrases, not_phrases = cq
    if any(t in doc_set for t in must_not):
        return False
    if any(t not in doc_set for t in must):
        return False
    if not must and should and not any(t in doc_set for t in should):
        return False
    def _pcount(toks: list[str], slop: int) -> int:
        # tokens are [a-z0-9]+, so the joined text re-tokenizes to the
        # same stream — the shared phrase specs apply verbatim.
        text = " ".join(doc_toks)
        return (
            sloppy_phrase_count(text, toks, slop)
            if slop > 1
            else phrase_count(text, toks)
        )

    if any(_pcount(toks, slop) == 0 for toks, slop in phrases):
        return False
    if any(_pcount(toks, slop) > 0 for toks, slop in not_phrases):
        return False
    # a query that is ONLY exclusions/phrases has no positive trigger:
    # Lucene pure-negation matches nothing; phrase-only queries matched
    # above. must/should/phrase presence already enforced.
    if not must and not should and not phrases:
        return False
    return True


def percolate(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    text_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, query_id): which registered queries each document
    matches. ``queries`` is the CLIENT-sized registered set [(query_id,
    query_string)]. One shuffle-free mapInPandas pass over ``docs``."""
    compiled, trigger, unconditional = compile_queries(queries)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_d, out_q = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize_text(text or "")
                tset = set(toks)
                cand: set[int] = set(unconditional)
                for t in tset:
                    ql = trigger.get(t)
                    if ql:
                        cand.update(ql)
                for i in sorted(cand):
                    if _matches(toks, tset, compiled[i]):
                        out_d.append(int(doc_id))
                        out_q.append(compiled[i][0])
            yield pd.DataFrame({"doc_id": out_d, "query_id": out_q}).astype(
                {"doc_id": "int64", "query_id": "int64"}
            )

    return docs.select(id_col, text_col).mapInPandas(run, PERC_SCHEMA)
