"""Posting-block codec: delta encoding + byte-aligned varint-style packing.

Capability analog of hora's PQ residual encoding ("store small numbers"):
PQ stores per-subspace center assignments instead of raw floats
(/root/reference/src/index/pq_idx.rs:117-120,143-146); we store doc-id GAPS
at a per-block byte width instead of raw int64s, plus a true LEB128 varint
codec. Both are numpy-vectorized end to end (the Arrow/numpy analog of the
reference's SIMD kernels, /root/reference/src/core/simd_metrics.rs:11-109).

Block layout (one posting list = one or more blocks of up to `block_size`
doc ids, always sorted ascending):

    byte 0          : width w in {1, 2, 4, 8}
    bytes 1..       : n little-endian uint{8w} gap values
    gap[0] = doc_ids[0] - base (base = previous block's last doc id, or 0)

tf values are encoded the same way (gaps replaced by raw tf, base 0).
Everything is deterministic: same input → same bytes, independent of
partitioning.
"""

from __future__ import annotations

import numpy as np


def segment_gather(starts, lens):
    """Index array taking variable-length segments (starts[i], lens[i])
    of a flat array in order — the shared trick for permuting/selecting
    per-row position lists without Python loops (used by the segment
    encoder and the phrase verifier)."""
    total = int(lens.sum()) if len(lens) else 0
    if total == 0:
        return np.empty(0, np.int64)
    cum = np.empty(len(lens) + 1, np.int64)
    cum[0] = 0
    np.cumsum(lens, out=cum[1:])
    return np.repeat(starts - cum[:-1], lens) + np.arange(total, dtype=np.int64)


_WIDTHS = np.array([1, 2, 4, 8], dtype=np.int64)


def _width_for(maxval: int) -> int:
    if maxval < (1 << 8):
        return 1
    if maxval < (1 << 16):
        return 2
    if maxval < (1 << 32):
        return 4
    return 8


_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def encode_block(values: np.ndarray, base: int = 0, delta: bool = True) -> bytes:
    """Encode one sorted (if delta) int64 block → bytes. Vectorized."""
    v = np.asarray(values, dtype=np.int64)
    if delta:
        gaps = np.diff(v, prepend=np.int64(base))
    else:
        gaps = v
    if len(gaps) and gaps.min() < 0:
        raise ValueError("negative gap — input not sorted / base too large")
    mx = int(gaps.max()) if len(gaps) else 0
    w = _width_for(mx)
    return bytes([w]) + gaps.astype(_DTYPES[w]).tobytes()


def decode_block(buf: bytes, base: int = 0, delta: bool = True) -> np.ndarray:
    """Decode one block → int64 array. Vectorized (np.frombuffer + cumsum)."""
    if not buf:
        return np.empty(0, dtype=np.int64)
    w = buf[0]
    gaps = np.frombuffer(buf, dtype=_DTYPES[w], offset=1).astype(np.int64)
    if delta:
        gaps = np.cumsum(gaps)
        gaps += base
    return gaps


def encode_posting(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int):
    """Split a sorted posting list into blocks.

    Returns (doc_blocks: list[bytes], tf_blocks: list[bytes],
             block_last_doc: int64[], block_n: int64[]).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = len(doc_ids)
    doc_blocks, tf_blocks, last_docs, ns = [], [], [], []
    base = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        doc_blocks.append(encode_block(doc_ids[s:e], base=base, delta=True))
        tf_blocks.append(encode_block(tfs[s:e], delta=False))
        base = int(doc_ids[e - 1])
        last_docs.append(base)
        ns.append(e - s)
    return doc_blocks, tf_blocks, np.array(last_docs, np.int64), np.array(ns, np.int64)


def decode_posting(doc_blocks, tf_blocks) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_posting over the block lists."""
    ids, tfs = [], []
    base = 0
    for db, tb in zip(doc_blocks, tf_blocks):
        d = decode_block(db, base=base, delta=True)
        ids.append(d)
        tfs.append(decode_block(tb, delta=False))
        if len(d):
            base = int(d[-1])
    if not ids:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ids), np.concatenate(tfs)


# ---------------------------------------------------------------- LEB128 ---
# True byte-granular varint (LEB128), numpy-vectorized, kept as the
# alternative codec and used in round-trip tests; the block codec above is
# the hot path because fixed-width decode is a single frombuffer.


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized (no per-value Python loop:
    at most 10 passes over the array, one per varint byte position)."""
    v = np.asarray(values, dtype=np.uint64).copy()
    if len(v) == 0:
        return b""
    # number of 7-bit groups per value
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        live = tmp > 0
        if not live.any():
            break
        nbits[live] += 1
        tmp = tmp >> np.uint64(7)
    nbits = np.maximum(nbits, 1)
    total = int(nbits.sum())
    out = np.zeros(total, dtype=np.uint8)
    # output offsets of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbits)[:-1]))
    maxb = int(nbits.max())
    for k in range(maxb):
        sel = nbits > k
        byte = (v[sel] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nbits[sel] > k + 1).astype(np.uint8) << 7
        out[starts[sel] + k] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """LEB128-decode → uint64 array, vectorized via continuation-bit scan."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(len(ends), dtype=np.uint64)
    # position of each byte within its value
    idx = np.arange(len(b), dtype=np.int64)
    value_id = np.searchsorted(ends, idx, side="left")
    pos = idx - starts[value_id]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * pos.astype(np.uint64))
    np.add.at(out, value_id, contrib)
    return out
