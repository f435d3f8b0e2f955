"""Deterministic docid assignment (SURVEY.md §7 step 4).

The reference assigns docids by ``os.walk`` encounter order
(``makeindex.py:94-108``) — not reproducible distributed. This rebuild uses a
canonical total order instead: docid = 1-based rank under
``(defrag(url), url, warc_ts)``. The serial oracle uses the same order, so
parity holds by construction.

Scale design: only the key projection ``(url, warc_ts)`` is sorted (a cheap
all-to-all over ~1% of the bytes); the resulting ``(docid, url, warc_ts)``
table is hash-joined back onto the full rows, so the heavy ``html`` column
moves through exactly one hash shuffle and is never range-sorted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from searchengine_ray.functions import htmlx


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _with_ids(t: pa.Table, start: int) -> pa.Table:
    ids = pa.array(np.arange(start, start + t.num_rows, dtype=np.int64))
    return t.append_column("docid", ids)


def zip_with_index(ds: ray.data.Dataset, col: str = "docid", start: int = 1) -> ray.data.Dataset:
    """Append a contiguous 1-based index column in the dataset's block order.

    The Dataset API has no zip-with-index, so this drops to block refs: count
    each block (zero-copy metadata reads), prefix-sum on the driver (one int
    per block), then label blocks in parallel. Blocks never leave the object
    store.
    """
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) + start
    labeled = [_with_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(labeled)


def _add_defrag(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    return batch.append_column("defrag_url", pa.array([htmlx.defrag(u) for u in urls], pa.string()))


def assign_docids(
    pages: ray.data.Dataset, num_partitions: int = 32
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Return (pages ⨝ docid, key table (docid, url, defrag_url, warc_ts)).

    The key table is sorted canonical order with contiguous docids; the big
    side gains ``docid`` and ``defrag_url`` via a hash join on (url, warc_ts).
    """
    keys = pages.select_columns(["url", "warc_ts"]).map_batches(
        _add_defrag, batch_format="pyarrow"
    )
    keys = keys.sort(["defrag_url", "url", "warc_ts"])
    keys = zip_with_index(keys, "docid")
    with_ids = pages.join(
        keys,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url", "warc_ts"),
    )
    return with_ids, keys
