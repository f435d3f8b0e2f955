"""The broadcast docid lookup must survive 64-bit key collisions
(VERDICT r1 wrong#6): a hash hit is only accepted after true-url
verification, scanning forward over the equal-key run."""

from __future__ import annotations

import numpy as np

from searchengine_ray.pipelines.build import _lookup_verified


def _lut(pairs):
    """pairs = [(key, url, docid)] → sorted lut arrays."""
    pairs = sorted(pairs, key=lambda p: p[0])
    keys = np.array([p[0] for p in pairs], dtype=np.uint64)
    urls = np.asarray([p[1] for p in pairs], dtype=object)
    docids = np.array([p[2] for p in pairs], dtype=np.int64)
    return keys, urls, docids


def test_collision_resolves_to_true_url():
    # three urls share ONE 64-bit key (worst case), plus a normal entry
    keys, urls, docids = _lut(
        [
            (7, "http://a/", 1),
            (7, "http://b/", 2),
            (7, "http://c/", 3),
            (9, "http://d/", 4),
        ]
    )
    bkeys = np.array([7, 7, 7, 9], dtype=np.uint64)
    probe_urls = ["http://c/", "http://a/", "http://b/", "http://d/"]
    keep, pos = _lookup_verified(keys, urls, bkeys, probe_urls)
    assert keep.tolist() == [0, 1, 2, 3]
    assert docids[pos[keep]].tolist() == [3, 1, 2, 4]


def test_collision_with_absent_url_is_dropped():
    keys, urls, docids = _lut([(7, "http://a/", 1), (7, "http://b/", 2)])
    bkeys = np.array([7, 8], dtype=np.uint64)
    # key collides but the url was never indexed -> must NOT match
    keep, _ = _lookup_verified(keys, urls, bkeys, ["http://evil/", "http://a/"])
    assert keep.size == 0


def test_no_collision_fast_path():
    keys, urls, docids = _lut([(1, "u1", 10), (5, "u2", 20), (9, "u3", 30)])
    bkeys = np.array([5, 2, 9], dtype=np.uint64)
    keep, pos = _lookup_verified(keys, urls, bkeys, ["u2", "nope", "u3"])
    assert keep.tolist() == [0, 2]
    assert docids[pos[keep]].tolist() == [20, 30]
