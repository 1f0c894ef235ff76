"""Delta + block codecs for posting lists — pure numpy (O22).

The reference keeps raw bytes in memory (no encoding, src/apm1.c:212-232);
the north rule mandates docID-sorted, delta-encoded block-compressed
posting lists. Everything here is vectorized numpy byte-twiddling — no
per-element Python in encode or decode hot paths.

Wire format (one posting list = one `PackedPostings`):
- postings are split into blocks of ``BLOCK_SIZE`` entries;
- per block, doc_ids are delta-encoded (first entry ABSOLUTE, so any block
  decodes independently — that is what makes block skipping possible),
  tfs and dls raw; all three streams encoded with the list's ``codec``:
  - ``varint`` (default): LEB128 — little-endian 7-bit groups,
    MSB = continuation;
  - ``packed``: frame-of-reference binary packing (the PForDelta family
    without the exception patch list): per block one width byte
    w = bits(max value in block), then ceil(cnt·w/8) bytes of
    little-endian-bit-packed values. Chosen per index via
    build_index(codec=...) and recorded in meta.json; scoring/phrase
    decode dispatch on PackedPostings.codec.
- per-block metadata kept as plain arrays (parquet columns):
  ``last_doc`` (skip pointer), ``max_impact`` (block-max BM25 impact,
  float64 upper bound — exact, not quantized, so WAND pruning is safe),
  byte offsets of each block in each stream (both codecs byte-align
  blocks, so the same offset columns serve both).
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


# --- frame-of-reference binary packing ("packed" codec) --------------------


def _bit_widths(block_max: np.ndarray) -> np.ndarray:
    """Per-block bit width = bit_length(max), min 1, capped 64. frexp's
    exponent ≥ true bit_length (float rounding only ever rounds UP across a
    power-of-two boundary), so widths are always sufficient."""
    m = np.asarray(block_max, dtype=np.uint64)
    _, exp = np.frexp(m.astype(np.float64))
    return np.clip(exp, 1, 64).astype(np.int64)


def pack_stream(values: np.ndarray, block_counts: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Bit-pack ``values`` into per-block frames: [width byte][payload].

    ``block_counts``: values per block (all > 0). Blocks are byte-aligned
    so the per-block byte offsets (returned, len n_blocks+1) slice the blob
    exactly like the varint path's offsets. Fully vectorized: one bit
    scatter + one packbits over the whole stream.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    counts = np.asarray(block_counts, dtype=np.int64)
    nb = len(counts)
    if len(v) == 0 or nb == 0:
        return b"", np.zeros(max(nb, 0) + 1, dtype=np.int64)
    bounds = np.concatenate(([0], np.cumsum(counts)))
    widths = _bit_widths(np.maximum.reduceat(v, bounds[:-1]))
    payload_bytes = (counts * widths + 7) // 8
    block_bytes = 1 + payload_bytes  # leading width byte
    offs = np.concatenate(([0], np.cumsum(block_bytes)))
    total_bytes = int(offs[-1])

    # Bit positions: value i (at index j within its block b) occupies bits
    # [(offs[b]+1)*8 + j*w_b, +w_b) — width byte skipped, little-endian bits.
    w_per_val = np.repeat(widths, counts)
    j_in_block = np.arange(len(v)) - np.repeat(bounds[:-1], counts)
    val_bit_start = (np.repeat(offs[:-1] + 1, counts) * 8) + j_in_block * w_per_val
    cum_w = np.concatenate(([0], np.cumsum(w_per_val)))
    total_bits = int(cum_w[-1])
    val_idx = np.repeat(np.arange(len(v)), w_per_val)
    bit_in_val = np.arange(total_bits) - np.repeat(cum_w[:-1], w_per_val)
    bits = np.zeros(total_bytes * 8, dtype=np.uint8)
    bits[np.repeat(val_bit_start, w_per_val) + bit_in_val] = (
        (v[val_idx] >> bit_in_val.astype(np.uint64)) & np.uint64(1)
    ).astype(np.uint8)
    blob = np.packbits(bits, bitorder="little")
    blob[offs[:-1]] = widths.astype(np.uint8)
    return blob.tobytes(), offs


def unpack_stream(
    blob: bytes, block_counts: np.ndarray, block_offs: np.ndarray | None = None
) -> np.ndarray:
    """Inverse of pack_stream. ``block_offs`` (len n_blocks, byte starts)
    defaults to re-deriving offsets from the width bytes sequentially —
    passing the stored offsets (parquet columns) keeps it fully vectorized.
    """
    counts = np.asarray(block_counts, dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(blob, dtype=np.uint8)
    if block_offs is None:
        offs = np.zeros(len(counts), dtype=np.int64)
        o = 0
        for b, c in enumerate(counts):
            offs[b] = o
            w = int(arr[o])
            o += 1 + (int(c) * w + 7) // 8
    else:
        offs = np.asarray(block_offs, dtype=np.int64)
    widths = arr[offs].astype(np.int64)
    bits = np.unpackbits(arr, bitorder="little")
    bounds = np.concatenate(([0], np.cumsum(counts)))
    w_per_val = np.repeat(widths, counts)
    j_in_block = np.arange(n) - np.repeat(bounds[:-1], counts)
    val_bit_start = (np.repeat(offs + 1, counts) * 8) + j_in_block * w_per_val
    cum_w = np.concatenate(([0], np.cumsum(w_per_val)))
    total_bits = int(cum_w[-1])
    val_idx_bits = np.arange(total_bits) - np.repeat(cum_w[:-1], w_per_val)
    contrib = bits[np.repeat(val_bit_start, w_per_val) + val_idx_bits].astype(
        np.uint64
    ) << val_idx_bits.astype(np.uint64)
    return np.add.reduceat(contrib, cum_w[:-1])


CODECS = ("varint", "packed")


def _encode_stream(
    values: np.ndarray, block_counts: np.ndarray, codec: str
) -> tuple[bytes, np.ndarray]:
    """(blob, byte offsets[len n_blocks+1]) for one stream, either codec."""
    if codec == "packed":
        return pack_stream(values, block_counts)
    parts, offs = [], np.zeros(len(block_counts) + 1, dtype=np.int64)
    bounds = np.concatenate(([0], np.cumsum(block_counts)))
    for b in range(len(block_counts)):
        parts.append(varint_encode(np.asarray(values[bounds[b] : bounds[b + 1]])))
        offs[b + 1] = offs[b] + len(parts[-1])
    return b"".join(parts), offs


def _decode_stream(
    blob: bytes,
    block_counts: np.ndarray,
    codec: str,
    block_offs: np.ndarray | None = None,
) -> np.ndarray:
    if codec == "packed":
        return unpack_stream(blob, block_counts, block_offs)
    return varint_decode(blob, int(np.sum(block_counts)))


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
    codec: str = "varint"


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint",
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

    counts = np.minimum(
        np.arange(1, n_blocks + 1) * block_size, n
    ) - np.arange(n_blocks) * block_size
    doc_blob, doc_o = _encode_stream(deltas, counts, codec)
    tf_blob, tf_o = _encode_stream(np.asarray(tfs), counts, codec)
    dl_blob, dl_o = _encode_stream(np.asarray(dls), counts, codec)
    impacts = bm25_impact(np.asarray(tfs), np.asarray(dls), avgdl) if n else np.zeros(0)
    bounds = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    last_doc = doc_ids[bounds[1:] - 1] if n else np.zeros(0, dtype=np.int64)
    max_imp = (
        np.maximum.reduceat(impacts, bounds[:-1]) if n else np.zeros(0)
    )
    return PackedPostings(
        n=n,
        doc_blob=doc_blob,
        tf_blob=tf_blob,
        dl_blob=dl_blob,
        block_last_doc=last_doc,
        block_max_impact=max_imp.astype(np.float64),
        doc_offs=doc_o[:-1].astype(np.int32),
        tf_offs=tf_o[:-1].astype(np.int32),
        dl_offs=dl_o[:-1].astype(np.int32),
        block_size=block_size,
        codec=codec,
    )


def encode_bucket_vectorized(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_bounds: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint",
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

    block_starts = np.flatnonzero(is_block_start)  # global posting idx
    block_ends = np.concatenate((block_starts[1:], [n]))
    impacts = bm25_impact(np.asarray(tfs), np.asarray(dls), avgdl)
    block_max = np.maximum.reduceat(impacts, block_starts)
    block_last = doc_ids[block_ends - 1]
    blocks_per_term = -(-counts // block_size)
    tb = np.concatenate(([0], np.cumsum(blocks_per_term)))  # term→block range

    if codec == "packed":
        # One vectorized pack per stream over the whole bucket; blocks are
        # byte-aligned frames, so per-term slicing is by BLOCK byte range.
        bc = block_ends - block_starts
        doc_blob, doc_boff = pack_stream(deltas, bc)
        tf_blob, tf_boff = pack_stream(np.asarray(tfs), bc)
        dl_blob, dl_boff = pack_stream(np.asarray(dls), bc)
        out = []
        for t in range(T):
            s, e = term_bounds[t], term_bounds[t + 1]
            b0, b1 = tb[t], tb[t + 1]
            out.append(
                {
                    "n": int(e - s),
                    "doc_blob": doc_blob[doc_boff[b0] : doc_boff[b1]],
                    "tf_blob": tf_blob[tf_boff[b0] : tf_boff[b1]],
                    "dl_blob": dl_blob[dl_boff[b0] : dl_boff[b1]],
                    "block_last_doc": block_last[b0:b1].tolist(),
                    "block_max_impact": block_max[b0:b1].tolist(),
                    "doc_offs": (doc_boff[b0:b1] - doc_boff[b0]).astype(np.int32).tolist(),
                    "tf_offs": (tf_boff[b0:b1] - tf_boff[b0]).astype(np.int32).tolist(),
                    "dl_offs": (dl_boff[b0:b1] - dl_boff[b0]).astype(np.int32).tolist(),
                }
            )
        return out

    doc_blob, doc_lens = varint_encode_with_lens(deltas)
    tf_blob, tf_lens = varint_encode_with_lens(np.asarray(tfs))
    dl_blob, dl_lens = varint_encode_with_lens(np.asarray(dls))
    doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
    dl_off = np.concatenate(([0], np.cumsum(dl_lens)))

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


def _block_counts(n: int, block_size: int) -> np.ndarray:
    n_blocks = (n + block_size - 1) // block_size
    return np.minimum(
        np.arange(1, n_blocks + 1) * block_size, n
    ) - np.arange(n_blocks) * block_size


def decode_postings(p: PackedPostings) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode → (doc_ids int64 ascending, tfs uint64, dls uint64)."""
    if p.codec == "packed":
        counts = _block_counts(p.n, p.block_size)
        deltas = unpack_stream(p.doc_blob, counts, p.doc_offs).astype(np.int64)
        tfs = unpack_stream(p.tf_blob, counts, p.tf_offs)
        dls = unpack_stream(p.dl_blob, counts, p.dl_offs)
        orig = np.cumsum(deltas)
        doc_ids = orig
        bs = p.block_size
        if p.n > bs:
            starts = np.arange(bs, p.n, bs)
            carries = orig[starts - 1].copy()
            lens = np.minimum(starts + bs, p.n) - starts
            sub = np.zeros(p.n, dtype=np.int64)
            sub[bs:] = np.repeat(carries, lens)
            doc_ids = orig - sub
        return doc_ids, tfs, dls
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
    one = np.array([cnt], dtype=np.int64)
    zero = np.zeros(1, dtype=np.int64)
    deltas = _decode_stream(
        p.doc_blob[p.doc_offs[bi] : de], one, p.codec, zero
    ).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tfs = _decode_stream(p.tf_blob[p.tf_offs[bi] : te], one, p.codec, zero)
    dls = _decode_stream(p.dl_blob[p.dl_offs[bi] : le], one, p.codec, zero)
    return doc_ids, tfs, dls
