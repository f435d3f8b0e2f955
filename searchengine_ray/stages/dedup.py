"""Deduplication stages D1 (exact url), D2 (exact content), D3 (simhash).

Reference semantics are sequential first-wins over the file-walk order
(``makeindex.py:124-141,192-213``).  Under the rebuild's canonical docid
order, first-wins == min-docid-wins, and the serial check cascade is
equivalent to a cascade of groupbys over *survivor* sets:

- D1 runs over non-empty rows (empty rows never enter the url set,
  ``makeindex.py:120-127``);
- D2 runs over D1 survivors (a url-pruned doc never adds its content hash,
  ``makeindex.py:130-141``);
- D3 runs over D2 survivors in docid order against the FIFO window of the
  last 200 *accepted* simhashes (``makeindex.py:73-79,197-213``).

D1/D2 shuffle only the narrow key table — never the html.  D3 has two
modes (SURVEY.md §2.7 D3):

- ``window`` — parity mode, replicates the sequential 200-window exactly.
  The (docid, simhash) column pair is pulled to the driver (8–12 B/doc) and
  scanned serially.  Fine to ~10^8 docs; beyond that use ``lsh``.
- ``lsh`` — scale mode: exact global Hamming-ball pruning over distinct
  simhash values (see :func:`simhash_prune_lsh`; banded LSH degenerates on
  skewed 8-bit bands).  Each doc is pruned iff ANY lower-docid doc sits
  within Hamming ≤ 3.  Divergence from the reference: global (no 200-doc
  window) and non-chained (a pruned doc can still prune later docs); both
  divergences are supersets of the window semantics for same-window pairs
  except chained prunes.
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from searchengine_ray import params
from searchengine_ray.functions import hashing


def _min_docid_winners(
    ds: ray.data.Dataset, col: str, num_partitions: int
) -> tuple[ray.data.Dataset, int]:
    """Rows whose docid is their group's minimum, with no per-group Python:
    the built-in (vectorized C) ``min`` aggregate produces the
    (key, min docid) winner table, and an inner hash join on (key, docid)
    selects exactly those rows — docid is globally unique, so the join is a
    precise argmin semi-join.

    Returns (winners, group count).  The group count is free (one row per
    key in the aggregate output), so callers get D1/D2 prune accounting
    without an extra pass.

    Scale note: the previous ``groupby(col).map_groups(keep_min)`` form
    invoked Python once per group — measured ~3.3M calls per pass at the
    ×768 bench corpus (3.84M pages), turning a seconds-sized stage into
    tens of minutes.  This form is one aggregate shuffle over the narrow
    key table plus the broadcast-or-join docid filter-back, all
    vectorized end to end."""
    mins = (
        ds.groupby(col)
        .min("docid")
        .map_batches(
            lambda t: pa.table({"docid": pc.cast(t["min(docid)"], pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_groups = mins.count()
    return _filter_by_docids(ds, mins, num_partitions), n_groups


# winner-docid broadcast cap for the D2 filter-back (8 B/docid ⇒ 240 MB);
# above it the filter becomes a hash semi-join on docid
D2_BROADCAST_DOCIDS = 30_000_000


def _filter_by_docids(
    ds: ray.data.Dataset, wins: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Keep ``ds`` rows whose docid appears in ``wins`` (a materialized
    single-column docid dataset).  Below ``D2_BROADCAST_DOCIDS`` the winner
    set broadcasts as one sorted int64 array (searchsorted membership —
    no shuffle, and immune to the schema-less empty blocks Ray aggregates
    emit on sparse partitions); above it, a hash semi-join on docid."""
    if wins.count() <= D2_BROADCAST_DOCIDS:
        tabs = [t for t in ray.get(wins.to_arrow_refs()) if t.num_rows]
        w = (
            np.sort(pa.concat_tables(tabs)["docid"].to_numpy())
            if tabs
            else np.empty(0, np.int64)
        )
        w_ref = ray.put(w)

        def keep(b: pa.Table) -> pa.Table:
            ww = ray.get(w_ref)
            if ww.size == 0:
                return b.slice(0, 0)
            docids = b["docid"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ww, docids), ww.size - 1)
            return b.filter(pa.array(ww[pos] == docids))

        return ds.map_batches(keep, batch_format="pyarrow")
    return ds.join(
        wins,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("docid",),
    )


def dedup_sorted(
    keys: ray.data.Dataset, num_partitions: int = 16
) -> tuple[ray.data.Dataset, dict]:
    """D1 ∘ D2 over a CANONICALLY SORTED key table — the zero-shuffle D1.

    ``build_index`` sorts keys by (defrag_url, url, warc_ts) and assigns
    monotone docids, so equal defrag_urls are globally contiguous and
    docid order == sort order.  D1 (min docid per defrag_url) therefore
    needs NO exchange at all:

    1. a narrow summary pass (defrag_url/empty/docid columns only,
       ``batch_size=None`` ⇒ one batch per materialized block) records per
       block: row/empty counts, the first/last non-empty defrag_url and
       the first non-empty docid;
    2. an O(blocks) driver stitch finds blocks whose first non-empty run
       CONTINUES the previous block's last run (possibly across all-empty
       blocks) — those blocks' first run-start rows are not true group
       starts; their docids form a ≤ num_blocks drop list;
    3. a second pass emits each block's run-start rows (vectorized
       first-of-run over the non-empty subsequence, exactly the driver
       path's kernel) minus the broadcast drop list.

    Both passes use ``batch_size=None`` over the SAME materialized dataset
    so they observe identical block boundaries — the stitch's correctness
    depends on that invariant.

    D2 (min docid per exact_hash among D1 survivors) does need a global
    exchange, but only of (exact_hash, docid) pairs (24 B/row): a
    vectorized min aggregate produces the winner docid set, which filters
    D1 back by broadcast (sorted int64 searchsorted) below
    ``D2_BROADCAST_DOCIDS`` and by hash semi-join above.

    Returns (survivors, stats) with stats keys n_rows / n_empty /
    d1_count / d2_count.  Replaces ~170 s of CPU-count-independent
    aggregate+join wall measured at the ×768 bench corpus with
    two narrow map passes + one 24 B/row aggregate.
    """
    keys = keys.materialize()

    def block_summary(b: pa.Table) -> pa.Table:
        empty = b["empty"].to_numpy(zero_copy_only=False)
        docid = b["docid"].to_numpy(zero_copy_only=False)
        nz = np.flatnonzero(~empty)
        if nz.size:
            url0 = b["defrag_url"][int(nz[0])].as_py()
            url1 = b["defrag_url"][int(nz[-1])].as_py()
            first_docid = int(docid[nz[0]])
        else:
            url0 = url1 = None
            first_docid = -1
        return pa.table(
            {
                "min_docid": pa.array([int(docid[0]) if docid.size else -1], pa.int64()),
                "n_rows": pa.array([b.num_rows], pa.int64()),
                "n_empty": pa.array([int(empty.sum())], pa.int64()),
                "first_nonempty_docid": pa.array([first_docid], pa.int64()),
                "first_url": pa.array([url0], pa.string()),
                "last_url": pa.array([url1], pa.string()),
            }
        )

    # Both passes map over the SAME materialized dataset object with
    # batch_size=None (one batch per stored block) — a select_columns
    # projection here is NOT contractually 1:1 on blocks, and a boundary
    # mismatch would fail silently by missing a drop-list entry (ADVICE
    # r4: duplicate D1 survivor).  block_summary touches only the three
    # narrow columns; the unused ones ride the zero-copy block reference.
    summaries = sorted(
        keys.map_batches(
            block_summary, batch_size=None, batch_format="pyarrow"
        ).take_all(),
        key=lambda s: s["min_docid"],
    )
    try:
        n_blocks = keys.num_blocks()
    except Exception:
        n_blocks = None
    if n_blocks is not None:
        # tripwire for the block-boundary invariant both passes rely on:
        # one summary row per stored block
        assert len(summaries) == n_blocks, (
            f"dedup_sorted block-summary boundary mismatch: "
            f"{len(summaries)} summaries != {n_blocks} blocks"
        )
    n_rows = int(sum(s["n_rows"] for s in summaries))
    n_empty = int(sum(s["n_empty"] for s in summaries))
    drop: list[int] = []
    prev_last_url = None  # carries across all-empty blocks
    for s in summaries:
        if s["first_url"] is None:
            continue
        if s["first_url"] == prev_last_url:
            drop.append(s["first_nonempty_docid"])
        prev_last_url = s["last_url"]
    drop_arr = np.sort(np.array(drop, dtype=np.int64))
    drop_ref = ray.put(drop_arr)

    def run_starts(b: pa.Table) -> pa.Table:
        empty = b["empty"].to_numpy(zero_copy_only=False)
        nz = np.flatnonzero(~empty)
        if nz.size == 0:
            return b.slice(0, 0)
        take_nz = pa.array(nz, pa.int64())
        col = b["defrag_url"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        url_nz = col.take(take_nz)  # plain Array: slices stay chunk-free
        first = np.ones(nz.size, dtype=bool)
        if nz.size > 1:
            first[1:] = pc.not_equal(
                url_nz.slice(1), url_nz.slice(0, nz.size - 1)
            ).to_numpy(zero_copy_only=False)
        idx = nz[first]
        t = b.take(pa.array(idx, pa.int64()))
        d = ray.get(drop_ref)
        if d.size:
            docids = t["docid"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(d, docids)
            pos_c = np.minimum(pos, d.size - 1)
            t = t.filter(pa.array(d[pos_c] != docids))
        return t

    d1 = keys.map_batches(
        run_starts, batch_size=None, batch_format="pyarrow"
    ).materialize()
    d1_count = d1.count()

    # D2: min docid per 8-byte exact_hash.  Map-side partial (pyarrow C
    # group_by within each block) first; below the driver-merge cap the
    # partials merge on the driver with one numpy unique pass (the Ray
    # groupby is a full sort exchange — measured 35 s of the 39 s dedup
    # wall at the ×768/32-CPU bench for 3.84M near-unique keys, vs <2 s
    # for partial+merge).  Above the cap, the distributed aggregate.
    def block_min_hash(b: pa.Table) -> pa.Table:
        g = b.select(["exact_hash", "docid"]).group_by("exact_hash").aggregate(
            [("docid", "min")]
        )
        return pa.table(
            {"exact_hash": g["exact_hash"], "docid": g["docid_min"]}
        )

    parts = d1.select_columns(["exact_hash", "docid"]).map_batches(
        block_min_hash, batch_format="pyarrow"
    ).materialize()
    if parts.count() <= D2_BROADCAST_DOCIDS:
        tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
        if tabs:
            mt = pa.concat_tables(tabs).combine_chunks()
            fixed = mt["exact_hash"].combine_chunks().cast(pa.binary(8))
            h64 = np.frombuffer(fixed.buffers()[1], dtype=np.uint64)[
                fixed.offset : fixed.offset + len(fixed)
            ]
            docids = mt["docid"].to_numpy(zero_copy_only=False)
            order = np.argsort(docids, kind="stable")
            _, first = np.unique(h64[order], return_index=True)
            wins_arr = np.sort(docids[order][first])
        else:
            wins_arr = np.empty(0, np.int64)
        d2_count = int(wins_arr.size)
        w_ref = ray.put(wins_arr)

        def keep(b: pa.Table) -> pa.Table:
            ww = ray.get(w_ref)
            if ww.size == 0:
                return b.slice(0, 0)
            ids = b["docid"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ww, ids), ww.size - 1)
            return b.filter(pa.array(ww[pos] == ids))

        survivors = d1.map_batches(keep, batch_format="pyarrow")
    else:
        mins = (
            parts.groupby("exact_hash")
            .min("docid")
            .map_batches(
                lambda t: pa.table(
                    {"docid": pc.cast(t["min(docid)"], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        d2_count = mins.count()
        survivors = _filter_by_docids(d1, mins, num_partitions)
    stats = {
        "n_rows": n_rows,
        "n_empty": n_empty,
        "d1_count": d1_count,
        "d2_count": d2_count,
    }
    return survivors, stats


def dedup_url_exact(
    keys: ray.data.Dataset, num_partitions: int = 16
) -> tuple[ray.data.Dataset, int, int]:
    """D1 ∘ D2 over the key table (docid, defrag_url, empty, exact_hash).

    Returns (survivors, d1_count, d2_count): the surviving rows (min docid
    per defrag_url, then per exact_hash) plus the per-stage group counts
    for prune accounting.  Two aggregate+join rounds over the narrow key
    table; html untouched."""
    nonempty = keys.filter(expr="empty == False")
    d1, n_urls = _min_docid_winners(nonempty, "defrag_url", num_partitions)
    d1 = d1.materialize()
    d2, n_hashes = _min_docid_winners(d1, "exact_hash", num_partitions)
    return d2, n_urls, n_hashes


def window_prune(
    docids: np.ndarray,
    simhashes: np.ndarray,
    window_size: int = params.SIMHASH_WINDOW,
    max_hamming: int = params.SIMHASH_HAMMING_MAX,
) -> set[int]:
    """Serial 200-window near-dup scan (``makeindex.py:197-213``).

    Input must be sorted by docid ascending.  Returns the pruned docid set.
    Vectorized per step: each candidate is compared against the whole window
    with a popcount table (window ≤ 200 ⇒ O(200) per doc, numpy inner loop).
    """
    pruned: set[int] = set()
    # circular FIFO buffer (order within the window doesn't affect the
    # any-match predicate, so eviction = overwrite oldest slot)
    buf = np.empty(window_size, dtype=np.uint32)
    size = 0
    pos = 0
    for docid, sim in zip(docids, simhashes):
        if size and hashing.hamming32_vec(buf[:size], int(sim)).min() <= max_hamming:
            pruned.add(int(docid))
            continue
        buf[pos] = sim
        pos = (pos + 1) % window_size
        size = min(size + 1, window_size)
    return pruned


# near_dup_mode="auto" switches window→lsh above this survivor count
# (mirrors linkgraph.AUTO_JOIN_EDGE_THRESHOLD): below it the driver-serial
# parity scan is a few seconds; above it the serial window would dominate
# the build wall while the global Hamming-ball path stays distributed.
AUTO_WINDOW_THRESHOLD = 2_000_000

# within lsh mode, the 32-bit driver distinct-merge engine (fastest: one
# 512 MB bitmap broadcast, no groupby) is selected up to this survivor
# count; above it the build auto-routes to
# :func:`simhash_prune_lsh_distributed` (O(1) driver state) — the VERDICT
# r3 "manual width/path switch" fix.  ~10^8 is where the driver
# distinct-value merge stops being cheap relative to the shuffle.
AUTO_DISTRIBUTED_THRESHOLD = 100_000_000


def simhash_prune_window(extracted: ray.data.Dataset) -> set[int]:
    """Parity-mode D3 over the extracted survivors: pull (docid, simhash)
    via zero-copy Arrow refs, scan serially in docid order, return pruned
    docids."""
    import ray as _ray

    refs = (
        extracted.select_columns(["docid", "simhash"]).materialize().to_arrow_refs()
    )
    t = pa.concat_tables(_ray.get(refs))
    if t.num_rows == 0:
        return set()
    order = pc.sort_indices(t, sort_keys=[("docid", "ascending")])
    t = t.take(order)
    return window_prune(
        t["docid"].to_numpy(), t["simhash"].to_numpy().astype(np.uint32)
    )


def _ball_masks(bits: int, radius: int) -> np.ndarray:
    """All non-zero XOR masks of popcount ≤ radius (the Hamming ball shell
    enumeration: C(32,1)+C(32,2)+C(32,3) = 5,488 masks at 32/3)."""
    from itertools import combinations

    ms = []
    for r in range(1, radius + 1):
        for comb in combinations(range(bits), r):
            m = 0
            for b in comb:
                m |= 1 << b
            ms.append(m)
    return np.array(ms, dtype=np.uint64)


@ray.remote
def _ball_thr_task(bm, tab, masks, lo, hi):
    """Threshold chunk [lo, hi) of the sorted distinct-value table: for
    each of the 5,488 Hamming≤3 XOR masks, probe the 2^32-bit bitmap —
    every hit is an exact neighbour whose min docid lowers the threshold.
    All args arrive as object-store refs (bitmap/table zero-copy)."""
    sv, sm = tab
    u = sv[lo:hi]
    thr = sm[lo:hi].astype(np.int64).copy()
    for m in masks:
        p = u ^ m
        hit = (bm[p >> np.uint32(3)] >> (p & np.uint32(7)).astype(np.uint8)) & 1
        idx = np.nonzero(hit)[0]
        if idx.size == 0:
            continue
        pos = np.searchsorted(sv, p[idx])
        thr[idx] = np.minimum(thr[idx], sm[pos])
    return thr


def lsh_threshold_arrays(
    extracted: ray.data.Dataset,
) -> tuple[np.ndarray, np.ndarray] | None:
    """(sorted distinct simhash values, per-value min-docid-within-ball≤3
    thresholds) for the 32-bit driver-merged D3 path, or ``None`` on an
    empty input.

    Candidate-generation schemes (banded LSH, half-split pigeonhole
    probes) degenerate on clustered fingerprints: skewed 8/16-bit keys
    put thousands of candidates in one bucket and the popcount verify
    becomes the wall (measured 3.5e9 candidate verifies = 121 s on the
    ×192-replica bench corpus).  Ball enumeration has no verify at all:

    1. map-side combine → (distinct simhash, min docid) table, merged and
       uniqued on the driver (V rows);
    2. a 2^32-bit direct-addressed bitmap of present values (512 MB,
       ``ray.put`` once — workers map it zero-copy from the object store)
       plus the sorted (value, min-docid) table are broadcast;
    3. raw Ray tasks (a Dataset stage would pay ~2 fixed executions for a
       7 MB result) chunk the value range; each probes all 5,488 masks of
       popcount ≤ 3 against the bitmap — every hit IS an exact Hamming≤3
       neighbour (no popcount verify), min docid fetched by binary search
       only for hits.

    Exact (asserted vs an all-pairs oracle in tests), order-free,
    O(V·5488) bitmap gathers total — independent of cluster skew.
    Caveat: the distinct-value table merges on the driver — bounded by
    V ≤ 2^32, fine to ~10^8 docs.  Beyond that use
    :func:`simhash_prune_lsh_distributed` (same semantics, O(1) driver,
    32- or 64-bit), which ``BuildConfig.simhash_bits=64`` selects
    automatically; at ≳10^9 docs the 32-bit value space itself saturates
    and the 64-bit fingerprint is required for Hamming≤3 to stay selective.
    """
    import ray as _ray

    def block_min(batch: pa.Table) -> pa.Table:
        """Map-side combine: min docid per distinct simhash within a block
        (replaces a groupby shuffle — distinct count is bounded by 2^32 so
        the driver merge below is cheap)."""
        sims = batch["simhash"].to_numpy().astype(np.uint32)
        docids = batch["docid"].to_numpy()
        order = np.argsort(docids, kind="stable")
        u, first = np.unique(sims[order], return_index=True)
        return pa.table(
            {
                "simhash": pa.array(u.astype(np.int64), pa.int64()),
                "mind": pa.array(docids[order][first], pa.int64()),
            }
        )

    partial = (
        extracted.select_columns(["docid", "simhash"])
        .map_batches(block_min, batch_format="pyarrow")
        .materialize()
    )
    mt = pa.concat_tables(_ray.get(partial.to_arrow_refs()))
    if mt.num_rows == 0:
        return None
    vals_all = mt["simhash"].to_numpy().astype(np.uint32)
    mins_all = mt["mind"].to_numpy()
    morder = np.argsort(mins_all, kind="stable")
    sorted_vals, first = np.unique(vals_all[morder], return_index=True)
    sorted_mins = mins_all[morder][first]

    bitmap = np.zeros(1 << 29, dtype=np.uint8)
    np.bitwise_or.at(
        bitmap,
        sorted_vals >> np.uint32(3),
        np.left_shift(np.uint8(1), (sorted_vals & np.uint32(7)).astype(np.uint8)),
    )
    bm_ref = _ray.put(bitmap)
    tab_ref = _ray.put((sorted_vals, sorted_mins))
    del bitmap
    masks_ref = _ray.put(_ball_masks(32, params.SIMHASH_HAMMING_MAX).astype(np.uint32))

    ncpu = max(2, int(_ray.cluster_resources().get("CPU", 8)))
    bounds = np.linspace(0, sorted_vals.size, ncpu * 4 + 1, dtype=np.int64)
    futures = [
        _ball_thr_task.remote(bm_ref, tab_ref, masks_ref, int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    thr = np.concatenate(_ray.get(futures)) if futures else np.empty(0, np.int64)
    return sorted_vals, thr


def simhash_prune_lsh(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """Scale-mode D3 as a pruned-docid Dataset (see
    :func:`lsh_threshold_arrays` for the algorithm): every doc whose docid
    exceeds its value's min-docid-within-ball≤3 threshold is pruned."""
    import ray as _ray

    res = lsh_threshold_arrays(extracted)
    if res is None:
        return ray.data.from_arrow(pa.table({"docid": pa.array([], pa.int64())}))
    sorted_vals, thr_arr = res
    thr_ref = _ray.put((sorted_vals, thr_arr))

    def prune(batch: pa.Table) -> pa.Table:
        sv, thr = _ray.get(thr_ref)
        sims = batch["simhash"].to_numpy().astype(np.uint32)
        docids = batch["docid"].to_numpy()
        pos = np.searchsorted(sv, sims)
        pos_c = np.minimum(pos, sv.size - 1)
        mask = docids > thr[pos_c]
        return pa.table({"docid": pa.array(docids[mask], pa.int64())})

    return extracted.select_columns(["docid", "simhash"]).map_batches(
        prune, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Fully distributed Hamming-ball prune (32- and 64-bit; no driver merge).
# ---------------------------------------------------------------------------

# threshold tables smaller than this are broadcast (ray.put sorted arrays)
# for the final prune pass; larger ones run a hash join instead
LSH_BROADCAST_THRESHOLD = 2_000_000


def _cluster_parts() -> int:
    import ray as _ray

    return max(8, int(_ray.cluster_resources().get("CPU", 8)))


def simhash_prune_lsh_distributed(
    extracted: ray.data.Dataset,
    bits: int = params.SIMHASH_BITS,
    max_hamming: int = params.SIMHASH_HAMMING_MAX,
) -> ray.data.Dataset:
    """Scale-mode D3 with O(1) driver state, at 32- or 64-bit width.

    Same exact global Hamming-ball semantics as :func:`simhash_prune_lsh`
    (each doc pruned iff ANY lower-docid doc sits within Hamming ≤ 3 of its
    fingerprint — equality tested both ways in ``test_scale_paths``), but
    every step is a Dataset shuffle, so nothing scales with corpus size on
    the driver:

    1. map-side combine + ``groupby(simhash).min(docid)`` → distinct-value
       table (V rows, distributed);
    2. each value is emitted into 4 piece buckets (key = the k-th of 4
       disjoint ``bits/4``-bit slices).  Pigeonhole: ham(u,v) ≤ 3 over 4
       disjoint pieces forces at least one piece EXACTLY equal, so every
       neighbour pair co-locates in ≥1 bucket — one ``groupby(bucket)``;
    3. inside each bucket group (``map_groups``), the remaining bits are
       half-split and probed with ≤1-flip masks over a sorted key table
       (ham ≤ 3 in the remainder ⇒ one half within ham ≤ 1), candidates
       verified by full-width popcount — the same probe structure as the
       driver path, just scoped to the group;
    4. ``groupby(simhash).min(thr)`` min-combines the 4 per-bucket
       thresholds, and the prune pass reads the threshold table via
       broadcast (≤ ``LSH_BROADCAST_THRESHOLD`` rows) or a cluster-sized
       hash join above that.

    Driver memory is O(1); worker memory is O(largest bucket) — buckets are
    V/2^(bits/4) expected (V/256 at 32-bit, V/65536 at 64-bit).  Use
    ``bits=64`` beyond ~10^9 docs, where the 32-bit value space saturates.
    """
    import ray as _ray

    udtype = np.uint64 if bits == 64 else np.uint32
    piece_bits = bits // 4  # 8 at 32-bit, 16 at 64-bit
    rem_bits = bits - piece_bits
    half_bits = rem_bits // 2  # 12 / 24

    def _to_u(a: np.ndarray) -> np.ndarray:
        if udtype == np.uint64:
            return a.view(np.uint64) if a.dtype == np.int64 else a.astype(np.uint64)
        return a.astype(np.uint32)

    def _to_i64(a: np.ndarray) -> np.ndarray:
        return a.view(np.int64) if a.dtype == np.uint64 else a.astype(np.int64)

    def block_min(batch: pa.Table) -> pa.Table:
        sims = _to_u(batch["simhash"].to_numpy())
        docids = batch["docid"].to_numpy()
        order = np.argsort(docids, kind="stable")
        u, first = np.unique(sims[order], return_index=True)
        return pa.table(
            {
                "simhash": pa.array(_to_i64(u), pa.int64()),
                "mind": pa.array(docids[order][first], pa.int64()),
            }
        )

    distinct = (
        extracted.select_columns(["docid", "simhash"])
        .map_batches(block_min, batch_format="pyarrow")
        .groupby("simhash")
        .min("mind")
    )

    piece_mask = (1 << piece_bits) - 1

    def expand(batch: pa.Table) -> pa.Table:
        sims = _to_u(batch["simhash"].to_numpy())
        minds = batch["min(mind)"].to_numpy().astype(np.int64)
        buckets = []
        for k in range(4):
            piece = (sims >> udtype(k * piece_bits)) & udtype(piece_mask)
            buckets.append(
                (np.int64(k) << np.int64(piece_bits)) | piece.astype(np.int64)
            )
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(buckets), pa.int64()),
                "simhash": pa.array(np.tile(_to_i64(sims), 4), pa.int64()),
                "mind": pa.array(np.tile(minds, 4), pa.int64()),
            }
        )

    half_masks = np.concatenate(
        [[0], 1 << np.arange(half_bits, dtype=np.uint64)]
    ).astype(udtype)
    rem_mask = udtype((1 << rem_bits) - 1)
    half_mask = udtype((1 << half_bits) - 1)

    def group_thr(group: pa.Table) -> pa.Table:
        vals = _to_u(group["simhash"].to_numpy())
        minds = group["mind"].to_numpy().astype(np.int64)
        thr = minds.copy()
        n = vals.size
        if n > 1:
            k = int(group["bucket"][0].as_py()) >> piece_bits
            # compress out piece k → rem_bits-wide remainder
            low_w = udtype(k * piece_bits)
            low = vals & ((udtype(1) << low_w) - udtype(1)) if k else np.zeros(
                n, dtype=udtype
            )
            shift_hi = (k + 1) * piece_bits
            high = (
                vals >> udtype(shift_hi)
                if shift_hi < bits
                else np.zeros(n, dtype=udtype)
            )
            rem = ((high << low_w) | low) & rem_mask
            halves = (rem >> udtype(half_bits), rem & half_mask)
            owner_base = np.arange(n)
            for hv in halves:
                o = np.argsort(hv, kind="stable")
                keys_s = hv[o]
                for m in half_masks:
                    probe = hv ^ m
                    lo = np.searchsorted(keys_s, probe, side="left")
                    hi = np.searchsorted(keys_s, probe, side="right")
                    counts = hi - lo
                    total = int(counts.sum())
                    if total == 0:
                        continue
                    owner = np.repeat(owner_base, counts)
                    idx = np.repeat(lo, counts) + (
                        np.arange(total)
                        - np.repeat(np.cumsum(counts) - counts, counts)
                    )
                    cand = o[idx]
                    ham = hashing.popcount_mat(vals[cand] ^ vals[owner])
                    ok = ham <= max_hamming
                    np.minimum.at(thr, owner[ok], minds[cand[ok]])
        return pa.table(
            {
                "simhash": group["simhash"],
                "thr": pa.array(thr, pa.int64()),
            }
        )

    thr_ds = (
        distinct.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(group_thr, batch_format="pyarrow")
        .groupby("simhash")
        .min("thr")
        .materialize()
    )
    n_values = thr_ds.count()

    if n_values <= LSH_BROADCAST_THRESHOLD:
        tt = pa.concat_tables(_ray.get(thr_ds.to_arrow_refs()))
        tvals = _to_u(tt["simhash"].to_numpy())
        tthr = tt["min(thr)"].to_numpy().astype(np.int64)
        torder = np.argsort(tvals)
        thr_ref = _ray.put((tvals[torder], tthr[torder]))

        def prune(batch: pa.Table) -> pa.Table:
            sv, thr = _ray.get(thr_ref)
            sims = _to_u(batch["simhash"].to_numpy())
            docids = batch["docid"].to_numpy()
            pos = np.searchsorted(sv, sims)
            pos_c = np.minimum(pos, sv.size - 1)
            mask = docids > thr[pos_c]
            return pa.table({"docid": pa.array(docids[mask], pa.int64())})

        return extracted.select_columns(["docid", "simhash"]).map_batches(
            prune, batch_format="pyarrow"
        )

    # threshold table too large to broadcast: cluster-sized hash join
    joined = extracted.select_columns(["docid", "simhash"]).join(
        thr_ds,
        join_type="inner",
        num_partitions=_cluster_parts(),
        on=("simhash",),
    )

    def filter_pruned(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch["docid"], batch["min(thr)"])
        return pa.table({"docid": batch.filter(mask)["docid"]})

    return joined.map_batches(filter_pruned, batch_format="pyarrow")
