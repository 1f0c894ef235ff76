"""Delta + varint block codec for posting lists — pure numpy (O22).

The reference keeps raw bytes in memory (no encoding, src/apm1.c:212-232);
the north rule mandates docID-sorted, delta+varint block-compressed posting
lists. Everything here is vectorized numpy byte-twiddling — no per-element
Python in encode or decode hot paths.

Wire format (one posting list = one `PackedPostings`):
- postings are split into blocks of ``BLOCK_SIZE`` entries;
- per block, doc_ids are delta-encoded (first entry ABSOLUTE, so any block
  decodes independently — that is what makes block skipping possible),
  tfs and dls raw; all three streams varint-encoded (LEB128: little-endian
  7-bit groups, MSB = continuation);
- per-block metadata kept as plain arrays (parquet columns):
  ``last_doc`` (skip pointer), ``max_impact`` (block-max BM25 impact,
  float64 upper bound — exact, not quantized, so WAND pruning is safe),
  byte offsets of each block in each stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75


def varint_encode_with_lens(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array of non-negative ints; also return the byte
    length of each value (for offset computation). Vectorized: fixed loop
    over ≤10 byte positions, all-array ops inside."""
    v = np.ascontiguousarray(values, dtype=np.uint64).copy()
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    out = np.zeros((n, 10), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    for i in range(10):
        byte = (v & np.uint64(0x7F)).astype(np.uint8)
        v >>= np.uint64(7)
        cont = v != 0
        out[:, i] = np.where(alive, byte | (cont.astype(np.uint8) << 7), 0)
        lens += alive
        alive = alive & cont
        if not alive.any():
            break
    mask = np.arange(10) < lens[:, None]
    return out[mask].tobytes(), lens


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_lens(values)[0]


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to uint64. Vectorized via reduceat."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = arr < 128
    starts = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    group_len = np.diff(np.concatenate((starts, [len(arr)])))
    pos = np.arange(len(arr)) - np.repeat(starts, group_len)
    shifted = (arr & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    vals = np.add.reduceat(shifted, starts)
    if count is not None:
        assert len(vals) == count, f"decoded {len(vals)} != expected {count}"
    return vals


def bm25_impact(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """(k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl)) — float64, shared formula."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@dataclass
class PackedPostings:
    """One encoded posting list (or one bucket of one)."""

    n: int
    doc_blob: bytes
    tf_blob: bytes
    dl_blob: bytes
    block_last_doc: np.ndarray  # int64 per block
    block_max_impact: np.ndarray  # float64 per block
    doc_offs: np.ndarray  # int32 per block: start offset into doc_blob
    tf_offs: np.ndarray
    dl_offs: np.ndarray
    block_size: int = BLOCK_SIZE


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> PackedPostings:
    """Encode one docID-sorted posting list into independent blocks."""
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    assert n == 0 or (np.diff(doc_ids) > 0).all(), "doc_ids must be strictly ascending"
    n_blocks = (n + block_size - 1) // block_size

    # Delta within blocks, absolute first entry per block.
    deltas = np.empty(n, dtype=np.int64)
    if n:
        deltas[0] = doc_ids[0]
        deltas[1:] = np.diff(doc_ids)
        block_starts = np.arange(0, n, block_size)
        deltas[block_starts] = doc_ids[block_starts]
        # Re-delta the first of each block vs nothing (absolute) — done above;
        # interior entries keep diffs vs predecessor (same block by constr.).

    doc_parts, tf_parts, dl_parts = [], [], []
    doc_offs = np.zeros(n_blocks, dtype=np.int32)
    tf_offs = np.zeros(n_blocks, dtype=np.int32)
    dl_offs = np.zeros(n_blocks, dtype=np.int32)
    last_doc = np.zeros(n_blocks, dtype=np.int64)
    max_imp = np.zeros(n_blocks, dtype=np.float64)
    impacts = bm25_impact(tfs, dls, avgdl) if n else np.zeros(0)
    od = ot = ol = 0
    for bi in range(n_blocks):
        s, e = bi * block_size, min(n, (bi + 1) * block_size)
        db = varint_encode(deltas[s:e])
        tb = varint_encode(np.asarray(tfs[s:e]))
        lb = varint_encode(np.asarray(dls[s:e]))
        doc_offs[bi], tf_offs[bi], dl_offs[bi] = od, ot, ol
        od, ot, ol = od + len(db), ot + len(tb), ol + len(lb)
        doc_parts.append(db)
        tf_parts.append(tb)
        dl_parts.append(lb)
        last_doc[bi] = doc_ids[e - 1]
        max_imp[bi] = impacts[s:e].max()
    return PackedPostings(
        n=n,
        doc_blob=b"".join(doc_parts),
        tf_blob=b"".join(tf_parts),
        dl_blob=b"".join(dl_parts),
        block_last_doc=last_doc,
        block_max_impact=max_imp,
        doc_offs=doc_offs,
        tf_offs=tf_offs,
        dl_offs=dl_offs,
        block_size=block_size,
    )


def encode_bucket_vectorized(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_bounds: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Encode ALL posting lists of one bucket in one vectorized pass.

    Inputs are the bucket's postings sorted by (term, doc_id);
    ``term_bounds`` = start indices per term plus a trailing n (len T+1).
    Semantically identical to calling encode_postings per term (tested),
    but every numpy op runs once over the whole bucket: deltas with resets
    at term/block starts, one varint pass per stream, reduceat block
    maxima. The only per-term Python is output-row slicing.

    Returns a list of dicts (one per term, in term_bounds order) with the
    same fields as the postings schema (minus the term itself).
    """
    n = len(doc_ids)
    T = len(term_bounds) - 1
    if n == 0:
        return []
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    counts = np.diff(term_bounds)
    # Position of each posting within its term → block starts.
    pos_in_term = np.arange(n) - np.repeat(term_bounds[:-1], counts)
    is_block_start = (pos_in_term % block_size) == 0
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ids[0]
    deltas[1:] = np.diff(doc_ids)
    deltas[is_block_start] = doc_ids[is_block_start]

    doc_blob, doc_lens = varint_encode_with_lens(deltas)
    tf_blob, tf_lens = varint_encode_with_lens(np.asarray(tfs))
    dl_blob, dl_lens = varint_encode_with_lens(np.asarray(dls))
    doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
    dl_off = np.concatenate(([0], np.cumsum(dl_lens)))

    block_starts = np.flatnonzero(is_block_start)  # global posting idx
    block_ends = np.concatenate((block_starts[1:], [n]))
    impacts = bm25_impact(np.asarray(tfs), np.asarray(dls), avgdl)
    block_max = np.maximum.reduceat(impacts, block_starts)
    block_last = doc_ids[block_ends - 1]
    blocks_per_term = -(-counts // block_size)
    tb = np.concatenate(([0], np.cumsum(blocks_per_term)))  # term→block range

    out = []
    for t in range(T):
        s, e = term_bounds[t], term_bounds[t + 1]
        b0, b1 = tb[t], tb[t + 1]
        bs = block_starts[b0:b1]
        out.append(
            {
                "n": int(e - s),
                "doc_blob": doc_blob[doc_off[s] : doc_off[e]],
                "tf_blob": tf_blob[tf_off[s] : tf_off[e]],
                "dl_blob": dl_blob[dl_off[s] : dl_off[e]],
                "block_last_doc": block_last[b0:b1].tolist(),
                "block_max_impact": block_max[b0:b1].tolist(),
                "doc_offs": (doc_off[bs] - doc_off[s]).astype(np.int32).tolist(),
                "tf_offs": (tf_off[bs] - tf_off[s]).astype(np.int32).tolist(),
                "dl_offs": (dl_off[bs] - dl_off[s]).astype(np.int32).tolist(),
            }
        )
    return out


def encode_positions(flat: np.ndarray, counts: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Delta+varint encode concatenated per-posting token-position lists.

    ``flat``: all positions of all postings back to back (each posting's
    list ascending); ``counts``: positions per posting (== tf). First
    position of each posting is ABSOLUTE, the rest are deltas — every
    posting decodes independently. Returns (blob, byte_offsets[n_postings+1])
    so callers can slice per-posting or per-term byte ranges.
    """
    n = len(flat)
    bounds = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    if n == 0:
        return b"", np.zeros(len(counts) + 1, dtype=np.int64)
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = flat[0]
    deltas[1:] = np.diff(flat)
    posting_starts = bounds[:-1][counts > 0]
    deltas[posting_starts] = flat[posting_starts]
    blob, lens = varint_encode_with_lens(deltas)
    byte_cum = np.concatenate(([0], np.cumsum(lens)))
    return blob, byte_cum[bounds]


def decode_positions(blob: bytes, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_positions: (flat positions int64, bounds[n+1])."""
    total = int(np.sum(counts))
    bounds = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    deltas = varint_decode(blob, total).astype(np.int64)
    if total == 0:
        return deltas, bounds
    orig = np.cumsum(deltas)
    starts = bounds[:-1][np.asarray(counts) > 0]
    # Undo cumsum carry-in at each posting start (first entry absolute).
    inner = starts[starts > 0]
    if len(inner):
        carries = orig[inner - 1].copy()
        seg_end = np.concatenate((inner[1:], [total]))
        sub = np.zeros(total, dtype=np.int64)
        sub[inner[0] :] = np.repeat(carries, seg_end - inner)
        orig = orig - sub
    return orig, bounds


def decode_postings(p: PackedPostings) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode → (doc_ids int64 ascending, tfs uint64, dls uint64)."""
    deltas = varint_decode(p.doc_blob, p.n).astype(np.int64)
    orig = np.cumsum(deltas)
    doc_ids = orig
    # Undo cumsum across block boundaries: the first entry of each block is
    # absolute, so the carry-in at block bi is the ORIGINAL cumsum just
    # before its start (= sum of all earlier deltas). Vectorized subtract.
    bs = p.block_size
    if p.n > bs:
        starts = np.arange(bs, p.n, bs)
        carries = orig[starts - 1].copy()
        lens = np.minimum(starts + bs, p.n) - starts
        sub = np.zeros(p.n, dtype=np.int64)
        sub[bs:] = np.repeat(carries, lens)
        doc_ids = orig - sub
    tfs = varint_decode(p.tf_blob, p.n)
    dls = varint_decode(p.dl_blob, p.n)
    return doc_ids, tfs, dls


def decode_block(
    p: PackedPostings, bi: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONE block independently (the skip path for WAND)."""
    n_blocks = len(p.block_last_doc)
    block_size = p.block_size
    s, e = bi * block_size, min(p.n, (bi + 1) * block_size)
    cnt = e - s
    de = p.doc_offs[bi + 1] if bi + 1 < n_blocks else len(p.doc_blob)
    te = p.tf_offs[bi + 1] if bi + 1 < n_blocks else len(p.tf_blob)
    le = p.dl_offs[bi + 1] if bi + 1 < n_blocks else len(p.dl_blob)
    deltas = varint_decode(p.doc_blob[p.doc_offs[bi] : de], cnt).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tfs = varint_decode(p.tf_blob[p.tf_offs[bi] : te], cnt)
    dls = varint_decode(p.dl_blob[p.dl_offs[bi] : le], cnt)
    return doc_ids, tfs, dls
