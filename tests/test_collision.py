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
    b = _url_ts_keys(urls, ts, salt="#k2")
    assert not np.any(a == b)  # different families for the same inputs
