"""Content hashing: exact (CRC32+length) and near-dup (32-bit simhash).

Semantics match the reference's from-scratch implementations
(``lib/duphash.py``): CRC-32 with the standard reflected polynomial
0xEDB88320 (init/xorout all-ones — i.e. the standard CRC-32/IEEE that
``zlib.crc32`` computes, which we use for speed; equality with a table-driven
reimplementation is asserted in tests), and CRC-64 with the standard
reflected polynomial 0xC96C5795D7870F42 (CRC-64/XZ parameters).

The simhash is the classic Charikar simhash over unigram word counts
(``lib/duphash.py:108-134``): each word hashed to 32 bits via
``crc64(word) mod 2^32``, per-bit signed sums weighted by count, fingerprint
bit i (MSB-first) = 1 iff the sum is strictly positive. Represented here as a
uint32 (bit 31 == the reference's ``v[0]``).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_CRC64_POLY = 0xC96C5795D7870F42

# table-driven CRC-64 (reflected), standard construction
_CRC64_TABLE = np.zeros(256, dtype=np.uint64)
for _i in range(256):
    _v = _i
    for _ in range(8):
        _v = (_v >> 1) ^ _CRC64_POLY if _v & 1 else _v >> 1
    _CRC64_TABLE[_i] = _v
_CRC64_TABLE_PY = [int(x) for x in _CRC64_TABLE]

# popcount-by-byte lookup for fast Hamming distance
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def crc32(data: bytes) -> int:
    """Standard CRC-32 (reflected 0xEDB88320, init/xorout 0xFFFFFFFF)."""
    return zlib.crc32(data) & 0xFFFFFFFF


def crc64(data: bytes) -> int:
    """Standard reflected CRC-64 (poly 0xC96C5795D7870F42, CRC-64/XZ)."""
    crc = 0xFFFFFFFFFFFFFFFF
    table = _CRC64_TABLE_PY
    for b in data:
        crc = (crc >> 8) ^ table[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFFFFFFFFFF


def exact_hash(content: str | bytes) -> bytes:
    """CRC-32 of the utf-8 content plus its byte length as an 8-byte key
    (``lib/duphash.py:80-92``)."""
    if isinstance(content, str):
        content = content.encode("utf-8")
    return crc32(content).to_bytes(4, "little") + len(content).to_bytes(4, "little")


def hash64_str(s: str) -> int:
    """Fast 64-bit string key: two C-speed CRC32s (plain and salted)
    packed into one word.  Used for broadcast join keys where a Python-dict
    broadcast would be re-deserialized per task — numpy key arrays are
    zero-copy out of the object store.  Collision odds are birthday-bound
    over 2^64 (~1e-7 at 2M keys, the broadcast threshold)."""
    b = s.encode("utf-8")
    return (zlib.crc32(b) << 32) | zlib.crc32(b"\x9e" + b)


def hash64_arr(strs) -> np.ndarray:
    """hash64_str over a sequence → uint64 array."""
    return np.fromiter(
        (hash64_str(s) for s in strs), dtype=np.uint64, count=len(strs)
    )


def hash64_bytes(b: bytes) -> int:
    """``hash64_str`` for a bytes payload (two C-speed CRC32s packed)."""
    return (zlib.crc32(b) << 32) | zlib.crc32(b"\x9e" + b)


def hash64_str_b2(s: str) -> int:
    """Structurally independent 64-bit key family: blake2b-8 of the utf-8
    bytes.  CRC is GF(2)-affine, so BOTH packed halves of ``hash64_str``
    collide whenever ``crc32`` collides between equal-length strings, and
    any CRC-of-the-same-bytes "salted" variant collides with them — the
    secondary family of the 128-bit collision guard must therefore be a
    non-linear hash (ADVICE r2, high).  blake2b is C-speed via hashlib."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def url_ts_keys(
    urls: list[str], ts_us: np.ndarray, family: int = 1
) -> np.ndarray:
    """64-bit (url, warc_ts) join keys.  ``family=1`` is the fast CRC32-pair
    probe key (:func:`hash64_str`); ``family=2`` is the STRUCTURALLY
    independent verification key (:func:`hash64_str_b2`, blake2b) — CRC is
    affine, so a salted CRC of the same bytes collides together with the
    primary and cannot serve as a collision guard (ADVICE r2, high)."""
    if family == 1:
        h = hash64_arr(urls)
        mult = np.uint64(0x9E3779B97F4A7C15)
    else:
        h = hash64_arr_b2(urls)
        mult = np.uint64(0xC2B2AE3D27D4EB4F)
    with np.errstate(over="ignore"):
        return h ^ (ts_us.astype(np.uint64) * mult)


def hash64_arr_b2(strs) -> np.ndarray:
    """hash64_str_b2 over a sequence → uint64 array."""
    b2 = hashlib.blake2b
    return np.fromiter(
        (
            int.from_bytes(b2(s.encode("utf-8"), digest_size=8).digest(), "little")
            for s in strs
        ),
        dtype=np.uint64,
        count=len(strs),
    )


class Md5WordHashCache:
    """Memoized md5-based word hashes — the SQL-replayable hash family.

    ``hash32`` is the big-endian first 4 digest bytes; DuckDB computes the
    identical value as ``CAST(concat('0x', substr(md5(term),1,8)) AS
    UINTEGER)`` (and the first 8 bytes for ``hash64``), which lets an
    external oracle replay simhash fingerprints bit-exactly.  The index
    build keeps the reference's CRC64 family (:class:`WordHashCache`)."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def hash32(self, word: str) -> int:
        h = self._cache.get(word)
        if h is None:
            h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "big")
            self._cache[word] = h
        return h

    def hash64(self, word: str) -> int:
        return int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")


class WordHashCache:
    """Memoized ``crc64(word) % 2^32`` (vocab is Zipfian; one per actor).
    ``hash64`` is the full crc64 — used by the 64-bit simhash scale path."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}
        self._cache64: dict[str, int] = {}

    def hash32(self, word: str) -> int:
        h = self._cache.get(word)
        if h is None:
            h = crc64(word.encode("utf-8")) & 0xFFFFFFFF
            if len(self._cache) < 2_000_000:
                self._cache[word] = h
        return h

    def hash64(self, word: str) -> int:
        h = self._cache64.get(word)
        if h is None:
            h = crc64(word.encode("utf-8"))
            if len(self._cache64) < 2_000_000:
                self._cache64[word] = h
        return h


_SHIFTS = np.arange(31, -1, -1, dtype=np.uint32)  # MSB-first, like the reference


def simhash(
    wordcnts: dict[str, int],
    hash_cache: WordHashCache | None = None,
    bits: int = 32,
) -> int:
    """Simhash over a word-count dict, as a uint int.

    ``bits=32`` (default) matches the reference fingerprint: bit 31
    corresponds to its first character (``lib/duphash.py:108-134``); a bit
    is set iff the signed sum is > 0.  ``bits=64`` is the scale-path
    fingerprint (same construction over the full crc64 word hash) — at
    ≳10^9 docs the 32-bit space saturates and Hamming≤3 stops being
    selective, so D3's LSH mode switches to 64-bit values.
    """
    if not wordcnts:
        return 0  # all-zero fingerprint (sums are all 0, not > 0)
    hc = hash_cache or _DEFAULT_WORD_HASHES
    word_hash = hc.hash64 if bits == 64 else hc.hash32
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    hashes = np.fromiter(
        (word_hash(w) for w in wordcnts), dtype=np.uint64, count=len(wordcnts)
    )
    counts = np.fromiter(wordcnts.values(), dtype=np.int64, count=len(wordcnts))
    bitm = ((hashes[:, None] >> shifts[None, :]) & 1).astype(np.int64)
    v = ((2 * bitm - 1) * counts[:, None]).sum(axis=0)
    # v[0] is the MSB (reference fingerprint char 0); bit set iff sum > 0
    weights = np.uint64(1) << shifts
    return int((weights * (v > 0)).sum(dtype=np.uint64))


def simhash_batch(
    wordcnts_list: list[dict[str, int]],
    hash_cache: WordHashCache | None = None,
    bits: int = 32,
) -> np.ndarray:
    """Vectorized :func:`simhash` over many word-count dicts at once
    (identical outputs — pinned by ``test_simhash_batch_matches_scalar``).

    Per-doc numpy-call overhead dominated the scalar path on the extract
    hot loop; here the batch vocabulary is deduped (Zipfian docs share
    words), the V×32 sign matrix is built once, and per-doc signed sums
    are one ``np.add.reduceat``.  Returns a uint32 array, one fingerprint
    per input dict (empty dicts → 0, like the scalar).  ``bits=64`` returns
    uint64 scale-path fingerprints (see :func:`simhash`)."""
    n = len(wordcnts_list)
    udtype = np.uint64 if bits == 64 else np.uint32
    out = np.zeros(n, dtype=udtype)
    if n == 0:
        return out
    hc = hash_cache or _DEFAULT_WORD_HASHES
    # flatten all (word, count) pairs at C speed (itertools.chain — the
    # explicit per-pair Python loop was the profile's hot line), then hash
    # each pair's word through the memo dict once
    from itertools import chain

    lens = np.fromiter(
        (len(wc) for wc in wordcnts_list), dtype=np.int64, count=n
    )
    total = int(lens.sum())
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    if total == 0:
        return out
    all_words = list(chain.from_iterable(wordcnts_list))
    cnt_arr = np.fromiter(
        chain.from_iterable(wc.values() for wc in wordcnts_list),
        dtype=np.int32,  # per-token tf < 2^31; keeps contrib at int32
        count=total,
    )
    word_hash = hc.hash64 if bits == 64 else hc.hash32
    pair_hashes = np.fromiter(
        (word_hash(w) for w in all_words), dtype=np.uint64, count=total
    )
    # dedupe hashes (docs share a Zipfian vocab) so the V×bits sign matrix
    # is built once per distinct hash, then gather per pair
    uh, inv = np.unique(pair_hashes, return_inverse=True)
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    signed = (
        2 * ((uh[:, None] >> shifts[None, :]) & 1).astype(np.int8) - 1
    )  # V×bits, MSB-first; int8 halves+ the gather/multiply bandwidth
    # int8 × int32 → int32: exact while any doc's signed tf sum < 2^31
    # (tf counts token occurrences in ONE document — far below)
    contrib = signed[inv] * cnt_arr[:, None]
    nonempty = np.flatnonzero(offsets[1:] > offsets[:-1])
    if nonempty.size:
        # reduceat over non-empty segments only (an empty segment would
        # yield the element at its offset instead of 0)
        v = np.add.reduceat(contrib, offsets[nonempty], axis=0)
        weights = np.uint64(1) << shifts
        out[nonempty] = (
            (weights[None, :] * (v > 0)).sum(axis=1, dtype=np.uint64).astype(udtype)
        )
    return out


def hamming32(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def hamming32_vec(arr: np.ndarray, h: int) -> np.ndarray:
    """Hamming distance of each uint32 in ``arr`` vs scalar ``h``."""
    x = arr ^ np.uint32(h)
    view = x.view(np.uint8).reshape(-1, 4)
    return _POPCNT8[view].sum(axis=1)


def popcount32_mat(x: np.ndarray) -> np.ndarray:
    """Elementwise popcount of a uint32 array of any shape (LUT on bytes)."""
    view = x.view(np.uint8).reshape(x.shape + (4,))
    return _POPCNT8[view].sum(axis=-1)


def popcount_mat(x: np.ndarray) -> np.ndarray:
    """Elementwise popcount of an unsigned integer array of any width/shape
    (LUT on bytes; input must be C-contiguous, which fancy-indexed candidate
    arrays always are)."""
    nb = x.dtype.itemsize
    view = x.view(np.uint8).reshape(x.shape + (nb,))
    return _POPCNT8[view].sum(axis=-1)


_DEFAULT_WORD_HASHES = WordHashCache()
