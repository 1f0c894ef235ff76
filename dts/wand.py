"""Block-max WAND document-at-a-time top-k (O19) — single-process kernel.

Runs INSIDE the scoring UDF per (query, shard of postings). Pure numpy +
a Python loop at pivot granularity (the skipping makes the loop count
sublinear in postings; the vectorized TAAT sibling in score_index.py is the
throughput path — both are exact and rank-identical, tested against each
other and the oracle).

Semantics contract (same as oracle / score_index):
- score(doc) = Σ idf(term) · impact(tf, dl) over the query's expanded term
  MULTISET, accumulated in ascending term order (bit-identical float64).
- ranking key (round(score, 9) DESC, doc_id ASC).
- block_max_impact is an exact float64 upper bound per block, so pruning
  never drops a true top-k member (codec stores exact maxima, no
  quantization — SURVEY.md §7.5).
"""

from __future__ import annotations

import heapq

import numpy as np

from dts.codec import PackedPostings, decode_block

ROUND_RANK = 9


class _Cursor:
    __slots__ = (
        "term", "idf", "p", "n_blocks", "bi", "docs", "tfs", "dls",
        "pos", "ub", "avgdl", "dead",
    )

    def __init__(
        self,
        term: str,
        idf: float,
        p: PackedPostings,
        avgdl: float | None = None,
        dead: np.ndarray | None = None,
    ):
        # ``avgdl`` / ``dead`` override the query-global values per cursor
        # — the fused MULTIFIELD path (round 5): each field's cursors
        # carry their own sub-index statistics and tombstones (weight
        # already folds in the field boost: w = boost · idf).
        self.avgdl = avgdl
        self.dead = dead if dead is not None and len(dead) else None
        self.term = term
        self.idf = idf
        self.p = p
        self.n_blocks = len(p.block_last_doc)
        self.bi = -1
        self.pos = 0
        self.docs = self.tfs = self.dls = None
        self.ub = idf * float(np.max(p.block_max_impact))  # global UB
        self._load(0)

    def _load(self, bi: int) -> None:
        if bi >= self.n_blocks:
            self.bi = self.n_blocks
            self.docs = None
            return
        if bi != self.bi:
            self.bi = bi
            self.docs, self.tfs, self.dls = decode_block(self.p, bi)
        self.pos = 0

    def exhausted(self) -> bool:
        return self.bi >= self.n_blocks

    def doc(self) -> int:
        return int(self.docs[self.pos])

    def block_ub(self) -> float:
        return self.idf * float(self.p.block_max_impact[self.bi])

    def advance(self) -> None:
        """Next posting."""
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load(self.bi + 1)

    def seek(self, target: int) -> None:
        """First posting with doc >= target — block skip + in-block search."""
        if self.exhausted():
            return
        if int(self.p.block_last_doc[self.bi]) < target:
            bi = int(np.searchsorted(self.p.block_last_doc, target, side="left"))
            self._load(bi)
            if self.exhausted():
                return
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):  # defensive; last_doc check precludes
            self._load(self.bi + 1)


def _impact(tf: float, dl: float, avgdl: float, k1: float, b: float) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bmw_topk(
    term_postings: list[tuple[str, float, PackedPostings]],
    k: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    deleted: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Block-max WAND over full (single-list-per-term) postings.

    ``term_postings``: (term, idf, packed) — the expanded term multiset
    (duplicates allowed), each with its COMPLETE posting list.
    Returns [(doc_id, score)] already ranked (round-9 desc, doc_id asc).

    ``deleted``: sorted tombstoned doc_ids — a tombstoned pivot is skipped
    before scoring (never enters the heap). ``allowed``: sorted ALLOW-list
    (Lucene filter context — round 4): when given, only member pivots are
    scored; None means unfiltered. Pruning stays sound either way:
    removing candidates can only lower true scores below the block-max
    upper bounds, never above.
    """
    if deleted is not None and not len(deleted):
        deleted = None
    if allowed is not None and not len(allowed):
        return []
    cursors = [
        _Cursor(tp[0], tp[1], tp[2], *tp[3:])
        for tp in term_postings
        if tp[2].n > 0
    ]
    cursors = [c for c in cursors if not c.exhausted()]
    heap: list[tuple[float, int]] = []  # (round9 score, -doc_id), min-heap

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -np.inf

    while True:
        live = [c for c in cursors if not c.exhausted()]
        if not live:
            break
        live.sort(key=lambda c: c.doc())
        # Pivot: smallest prefix whose UB sum can beat the threshold.
        # Pruning epsilon: thresholds are ROUND_RANK-rounded scores and ties
        # at the boundary must stay eligible (smaller doc_id wins a tie), so
        # prune only when the UB falls strictly below threshold - eps.
        eps = 1e-9
        ub_acc, pivot_idx = 0.0, -1
        th = threshold()
        for i, c in enumerate(live):
            ub_acc += c.ub
            if ub_acc >= th - eps:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # even all terms together can't beat the k-th score
        pivot_doc = live[pivot_idx].doc()
        if live[0].doc() == pivot_doc:
            # Block-max refinement: pivot_doc's score comes ONLY from the
            # cursors currently AT pivot_doc (a prefix of `live`); bound it
            # by their current-block maxima.
            contributors = [c for c in live if c.doc() == pivot_doc]
            is_excluded = deleted is not None and bool(
                np.searchsorted(deleted, pivot_doc) < len(deleted)
                and deleted[np.searchsorted(deleted, pivot_doc)] == pivot_doc
            )
            if not is_excluded and allowed is not None:
                ai = int(np.searchsorted(allowed, pivot_doc))
                is_excluded = not (
                    ai < len(allowed) and allowed[ai] == pivot_doc
                )
            block_ub = sum(c.block_ub() for c in contributors)
            if not is_excluded and block_ub >= th - eps:
                # Score fully — ascending term order for bit-identity.
                # Per-cursor tombstones (fused multifield): a doc deleted
                # in ONE field only loses that field's contribution; a doc
                # with no live contributor is never emitted.
                contributors.sort(key=lambda c: c.term)
                s = 0.0
                any_live = False
                for c in contributors:
                    if c.dead is not None:
                        di = int(np.searchsorted(c.dead, pivot_doc))
                        if di < len(c.dead) and c.dead[di] == pivot_doc:
                            continue
                    any_live = True
                    s += c.idf * _impact(
                        float(c.tfs[c.pos]), float(c.dls[c.pos]),
                        c.avgdl if c.avgdl is not None else avgdl, k1, b,
                    )
                key = (round(s, ROUND_RANK), -pivot_doc)
                if any_live:
                    if len(heap) < k:
                        heapq.heappush(heap, (key[0], key[1], pivot_doc, s))
                    elif (key[0], key[1]) > (heap[0][0], heap[0][1]):
                        heapq.heapreplace(heap, (key[0], key[1], pivot_doc, s))
            for c in contributors:
                c.advance()
        else:
            for c in live[:pivot_idx]:
                c.seek(pivot_doc)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(doc, s) for _, _, doc, s in out]
