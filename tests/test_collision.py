"""The broadcast docid lookup must survive 64-bit key collisions
(VERDICT r1 wrong#6): a primary-key hit only counts when an independent
second 64-bit key also matches (128 bits combined, zero-copy broadcast),
scanning forward over the equal-primary-key run."""

from __future__ import annotations

import numpy as np

from searchengine_ray.pipelines.build import _lookup_verified, _url_ts_keys


def _lut(rows):
    """rows = [(k1, k2, docid)] → sorted lut arrays."""
    rows = sorted(rows, key=lambda p: p[0])
    k1 = np.array([p[0] for p in rows], dtype=np.uint64)
    k2 = np.array([p[1] for p in rows], dtype=np.uint64)
    docids = np.array([p[2] for p in rows], dtype=np.int64)
    return k1, k2, docids


def test_collision_resolves_to_true_key():
    # three entries share ONE primary key (worst case), plus a normal entry
    k1, k2, docids = _lut([(7, 100, 1), (7, 200, 2), (7, 300, 3), (9, 400, 4)])
    bkeys = np.array([7, 7, 7, 9], dtype=np.uint64)
    bkeys2 = np.array([300, 100, 200, 400], dtype=np.uint64)
    keep, pos = _lookup_verified(k1, k2, bkeys, bkeys2)
    assert keep.tolist() == [0, 1, 2, 3]
    assert docids[pos[keep]].tolist() == [3, 1, 2, 4]


def test_collision_with_absent_secondary_is_dropped():
    k1, k2, docids = _lut([(7, 100, 1), (7, 200, 2)])
    bkeys = np.array([7, 8], dtype=np.uint64)
    # primary collides but the second key never matches -> must NOT match
    keep, _ = _lookup_verified(k1, k2, bkeys, np.array([999, 100], dtype=np.uint64))
    assert keep.size == 0


def test_no_collision_fast_path():
    k1, k2, docids = _lut([(1, 11, 10), (5, 55, 20), (9, 99, 30)])
    bkeys = np.array([5, 2, 9], dtype=np.uint64)
    keep, pos = _lookup_verified(k1, k2, bkeys, np.array([55, 0, 99], dtype=np.uint64))
    assert keep.tolist() == [0, 2]
    assert docids[pos[keep]].tolist() == [20, 30]


def test_key_families_are_independent():
    urls = [f"https://x/{i}" for i in range(1000)]
    ts = np.arange(1000, dtype=np.int64)
    a = _url_ts_keys(urls, ts)
    b = _url_ts_keys(urls, ts, family=2)
    assert not np.any(a == b)  # different families for the same inputs


# Equal-length strings with equal crc32 (birthday-searched, seed 12345).
# CRC is GF(2)-affine, so this single collision propagates to BOTH packed
# halves of hash64_str AND to any salted-CRC-of-the-same-bytes variant —
# the exact failure mode the secondary family must break (ADVICE r2).
_CRC_PAIR = ("8r7val5qgvx7", "j01vp43zm44n")


def test_crc_collision_does_not_propagate_to_secondary_family():
    import zlib

    from searchengine_ray.functions.hashing import hash64_str, hash64_str_b2

    a, b = _CRC_PAIR
    assert len(a) == len(b)
    assert zlib.crc32(a.encode()) == zlib.crc32(b.encode())  # pair is live
    # the affine flaw: the full 64-bit primary collides too
    assert hash64_str(a) == hash64_str(b)
    # the guard: the blake2 secondary family MUST differ (fails for any
    # CRC-of-the-same-bytes construction, salted or not)
    assert hash64_str_b2(a) != hash64_str_b2(b)
    ts = np.zeros(2, dtype=np.int64)  # equal warc_ts cancels the ts mixing
    k2 = _url_ts_keys([a, b], ts, family=2)
    assert k2[0] != k2[1]


def test_lookup_with_crc_colliding_urls_assigns_correct_docids():
    a, b = _CRC_PAIR
    ts = np.zeros(2, dtype=np.int64)
    k1 = _url_ts_keys([a, b], ts)
    k2 = _url_ts_keys([a, b], ts, family=2)
    assert k1[0] == k1[1]  # genuine 64-bit primary collision
    order = np.argsort(k1, kind="stable")
    keys_sorted = k1[order]
    keys2_sorted = k2[order]
    docids = np.array([10, 20], dtype=np.int64)[order]
    # probe in the opposite order: each url must resolve to ITS docid
    keep, pos = _lookup_verified(keys_sorted, keys2_sorted, k1[::-1].copy(), k2[::-1].copy())
    assert keep.tolist() == [0, 1]
    assert docids[pos[keep]].tolist() == [20, 10]
