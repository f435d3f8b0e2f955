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
- ``lsh`` — scale mode: the 32-bit simhash splits into 4 bands of 8 bits;
  Hamming ≤ 3 ⇒ at least one band matches exactly (pigeonhole), so banding
  finds every near-dup pair.  Each doc is pruned iff some *lower-docid* doc
  within Hamming ≤ 3 shares a band.  Divergence from the reference: global
  (no 200-doc window) and non-chained (a pruned doc can still prune later
  docs); both divergences are supersets of the window semantics for
  same-window pairs except chained prunes.
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from searchengine_ray import params
from searchengine_ray.functions import hashing


def _keep_min_docid(group: pa.Table) -> pa.Table:
    """One row per group: the minimum-docid row (first-wins under canonical
    order)."""
    idx = pc.index(
        pc.equal(group["docid"], pc.min(group["docid"])), True
    ).as_py()
    return group.slice(idx, 1)


def dedup_url_exact(keys: ray.data.Dataset) -> ray.data.Dataset:
    """D1 ∘ D2 over the key table (docid, defrag_url, empty, exact_hash).

    Returns the surviving rows (min docid per defrag_url, then per
    exact_hash).  Two key-table shuffles; html untouched.
    """
    nonempty = keys.filter(expr="empty == False")
    d1 = nonempty.groupby("defrag_url").map_groups(
        _keep_min_docid, batch_format="pyarrow"
    )
    d2 = d1.groupby("exact_hash").map_groups(_keep_min_docid, batch_format="pyarrow")
    return d2


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


def _band_rows(batch: pa.Table) -> pa.Table:
    """(docid, simhash) → 4 rows (band_key, docid, simhash); band_key packs
    (band index, 8 band bits)."""
    docids = batch["docid"].to_numpy()
    sims = batch["simhash"].to_numpy().astype(np.uint32)
    n = len(docids)
    bands = np.arange(4, dtype=np.uint32)
    # band b holds bits [8b, 8b+8)
    vals = (sims[:, None] >> (bands[None, :] * 8)) & np.uint32(0xFF)
    keys = (bands[None, :] << 8 | vals).astype(np.int32)
    return pa.table(
        {
            "band_key": pa.array(keys.ravel(), pa.int32()),
            "docid": pa.array(np.repeat(docids, 4), pa.int64()),
            "simhash": pa.array(np.repeat(sims.astype(np.int64), 4), pa.int64()),
        }
    )


def _prune_in_band(group: pa.Table) -> pa.Table:
    """Within one band bucket: emit docids having a lower-docid doc within
    Hamming ≤ 3 (O(g²) popcount, groups are band-sized so small)."""
    idx = pc.sort_indices(group, sort_keys=[("docid", "ascending")])
    g = group.take(idx)
    docids = g["docid"].to_numpy()
    sims = g["simhash"].to_numpy().astype(np.uint32)
    pruned = []
    for i in range(1, len(docids)):
        if hashing.hamming32_vec(sims[:i], int(sims[i])).min() <= params.SIMHASH_HAMMING_MAX:
            pruned.append(docids[i])
    return pa.table({"docid": pa.array(pruned, pa.int64())})


def simhash_prune_lsh(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """Scale-mode D3: banded LSH.  Returns a Dataset of pruned docids
    (distinct)."""
    bands = extracted.select_columns(["docid", "simhash"]).map_batches(
        _band_rows, batch_format="pyarrow"
    )
    pruned = bands.groupby("band_key").map_groups(_prune_in_band, batch_format="pyarrow")
    return pruned.groupby("docid").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
