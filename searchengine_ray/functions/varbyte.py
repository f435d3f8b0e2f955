"""Delta + varbyte posting-list compression and block-max metadata.

No reference counterpart (the reference stores fixed 16-byte postings,
``lib/posting.py:45-62``); these are the north-star requirements:
delta-encoded docid gaps, varbyte (7-bit groups, high bit marks the final
byte — the classic IR varbyte of Manning et al., IIR §5.3), and per-block
max-score metadata for block-max WAND.

Both encode and decode are fully vectorized with numpy — no per-posting
Python loop — because head-term posting lists at web scale hold 10^8+ ids.
"""

from __future__ import annotations

import numpy as np

_TERMINATOR = np.uint8(0x80)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint64 array. 7-bit groups little-endian
    (least-significant group first); the final byte of each value has the
    high bit set."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + floor(bit_length / 7) for bit_length >= 1
    nb = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    vv = v.copy()
    while True:
        mask = vv >= thresh
        if not mask.any():
            break
        nb[mask] += 1
        vv[mask] >>= np.uint64(7)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nb)
    starts = ends - nb
    maxnb = int(nb.max())
    vv = v.copy()
    for k in range(maxnb):
        alive = nb > k
        pos = starts[alive] + k
        out[pos] = (vv[alive] & np.uint64(0x7F)).astype(np.uint8)
        vv[alive] >>= np.uint64(7)
    out[ends - 1] |= _TERMINATOR
    return out.tobytes()


def vb_decode(data: bytes) -> np.ndarray:
    """Decode a varbyte blob back into a uint64 array (vectorized)."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) != 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.uint64)
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    # byte position within each value
    lengths = ends - starts + 1
    maxlen = int(lengths.max())
    for k in range(maxlen):
        alive = lengths > k
        values[alive] |= payload[starts[alive] + k] << np.uint64(7 * k)
    return values


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending int array -> first value + gaps (uint64)."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def encode_postings(docids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted docids, aligned tfs) -> (docids_vb, tfs_vb) blobs."""
    return vb_encode(delta_encode(docids)), vb_encode(np.asarray(tfs, dtype=np.uint64))


def decode_postings(docids_vb: bytes, tfs_vb: bytes) -> tuple[np.ndarray, np.ndarray]:
    docids = delta_decode(vb_decode(docids_vb))
    tfs = vb_decode(tfs_vb)
    return docids.astype(np.int64), tfs.astype(np.int64)


def block_max(
    docids: np.ndarray,
    scores: np.ndarray,
    block_size: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per block of ``block_size`` postings: (last docid, max score bound).

    ``scores`` is the per-posting upper-bound contribution (e.g. the BM25
    tf-saturation term × idf); WAND skips a block when its bound can't beat
    the current top-k threshold.
    """
    n = len(docids)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    nblocks = (n + block_size - 1) // block_size
    last = np.asarray(docids, dtype=np.int64)[
        np.minimum(np.arange(1, nblocks + 1) * block_size - 1, n - 1)
    ]
    pad = nblocks * block_size - n
    padded = np.pad(np.asarray(scores, dtype=np.float32), (0, pad), constant_values=-np.inf)
    bounds = padded.reshape(nblocks, block_size).max(axis=1)
    return last, bounds.astype(np.float32)
