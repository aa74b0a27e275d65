"""Posting-list codec: delta + VByte, 128-posting blocks, block-max metadata.

The reference stores postings inside Lucene segments (delta+VInt with skip
lists — public Lucene format knowledge); we re-implement the same ideas
numpy-vectorized so encode/decode run over whole Arrow batches with no
per-row Python (BASELINE.json input_hint requirement).

Frozen layout (SURVEY.md §7.0) per term::

    payload  = concat over blocks of [vbyte(doc_deltas) vbyte(tfs) vbyte(dls)]
    block i  covers postings [128*i, min(128*(i+1), n))
    doc_deltas[0] of block i is relative to block i-1's last doc
    (absolute for block 0) — so a block is decodable knowing only the
    previous block's last_doc, which lives in the metadata arrays.

Per-term metadata columns (enable block skipping WITHOUT decoding):
    block_offset : int32[]  byte offset of each block in payload
    block_last   : int64[]  last doc_id of each block
    block_max_tf : int32[]  max tf within block
    block_min_dl : int32[]  min dl within block

Block-max score bound (WAND): tf_norm is increasing in tf and decreasing in
dl, so  idf * max_tf/(max_tf + k1*(1-b+b*min_dl/avgdl))  upper-bounds every
posting in the block — prune-only, never changes scores (rank-identical
guarantee).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


def vbyte_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-style varint encode (little-endian 7-bit groups, msb=continuation).

    Fully vectorized: O(max_bytes) numpy passes, no Python per-value loop.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nbytes = np.ones(v.size, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nbytes += (x > 0).astype(np.int64)
        x >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8)
        out[starts[mask] + j] = byte | (cont << 7)
    return out


def vbyte_decode(buf: np.ndarray, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``n`` varints from ``buf`` starting at ``offset``.

    Returns (values uint64, next_offset). Vectorized over terminator bytes.
    """
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset
    b = buf[offset:]
    term_pos = np.nonzero((b & 0x80) == 0)[0]
    ends = term_pos[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * j
        )
    return vals, offset + int(ends[-1]) + 1


class EncodedPostings:
    """Encoded form of one term's posting list (plain struct-of-arrays)."""

    __slots__ = ("n", "payload", "block_offset", "block_last", "block_max_tf", "block_min_dl")

    def __init__(self, n, payload, block_offset, block_last, block_max_tf, block_min_dl):
        self.n = n
        self.payload = payload
        self.block_offset = block_offset
        self.block_last = block_last
        self.block_max_tf = block_max_tf
        self.block_min_dl = block_min_dl


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> EncodedPostings:
    """Encode one term's postings. ``doc_ids`` must be sorted strictly ascending."""
    n = int(doc_ids.size)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n_blocks = (n + BLOCK - 1) // BLOCK
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0:1] = doc_ids[0:1].astype(np.uint64)
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    # block-initial deltas must be relative to previous block's last doc —
    # which diff already gives; block 0's first delta is the absolute id. ✔
    chunks: list[np.ndarray] = []
    block_offset = np.zeros(n_blocks, dtype=np.int32)
    block_last = np.zeros(n_blocks, dtype=np.int64)
    block_max_tf = np.zeros(n_blocks, dtype=np.int32)
    block_min_dl = np.zeros(n_blocks, dtype=np.int32)
    pos = 0
    for i in range(n_blocks):
        lo, hi = i * BLOCK, min((i + 1) * BLOCK, n)
        enc = np.concatenate(
            [
                vbyte_encode(deltas[lo:hi]),
                vbyte_encode(tfs[lo:hi].astype(np.uint64)),
                vbyte_encode(dls[lo:hi].astype(np.uint64)),
            ]
        )
        block_offset[i] = pos
        block_last[i] = doc_ids[hi - 1]
        block_max_tf[i] = tfs[lo:hi].max()
        block_min_dl[i] = dls[lo:hi].min()
        chunks.append(enc)
        pos += enc.size
    payload = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
    return EncodedPostings(n, payload, block_offset, block_last, block_max_tf, block_min_dl)


def decode_block(
    payload: np.ndarray, n: int, block_idx: int, block_offset: np.ndarray, prev_last: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block → (doc_ids, tfs, dls). ``prev_last`` = last doc of
    the previous block (0 base for block 0; block 0's first delta is absolute)."""
    lo = block_idx * BLOCK
    cnt = min(BLOCK, n - lo)
    off = int(block_offset[block_idx])
    deltas, off = vbyte_decode(payload, cnt, off)
    tfs, off = vbyte_decode(payload, cnt, off)
    dls, _ = vbyte_decode(payload, cnt, off)
    docs = np.cumsum(deltas.astype(np.int64)) + (prev_last if block_idx > 0 else 0)
    return docs, tfs.astype(np.int64), dls.astype(np.int64)


def decode_postings(enc_n: int, payload: np.ndarray, block_offset: np.ndarray,
                    block_last: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the full posting list → (doc_ids, tfs, dls)."""
    n_blocks = len(block_offset)
    docs = np.empty(enc_n, dtype=np.int64)
    tfs = np.empty(enc_n, dtype=np.int64)
    dls = np.empty(enc_n, dtype=np.int64)
    for i in range(n_blocks):
        lo = i * BLOCK
        prev_last = int(block_last[i - 1]) if i > 0 else 0
        d, t, l = decode_block(payload, enc_n, i, block_offset, prev_last)
        docs[lo : lo + d.size] = d
        tfs[lo : lo + d.size] = t
        dls[lo : lo + d.size] = l
    return docs, tfs, dls
