"""The index-build pipeline: pages → docs + edges + texts + segments.

Ray-Data re-expression of ``makeindex.py`` (SURVEY.md §3.1 rebuild trace):

1. ``page_keys`` map: narrow key table (url, warc_ts, defrag_url, empty,
   exact_hash) — html is scanned once, never shuffled for dedup.
2. docid assignment: sort the key table by (defrag_url, url, warc_ts),
   zip-with-index (canonical order, SURVEY.md §7 step 4).  Every input row
   consumes a docid — empty/dup rows leave gaps, matching the reference's
   sparse docid space (``makeindex.py:108``, ``lib/reader.py:56-66``).
3. D1/D2 dedup groupbys on the key table (min docid wins == first wins).
4. One hash join attaches (docid, defrag_url) to the surviving html rows —
   the only shuffle the html column ever takes.
5. ``ExtractBatch`` actor pool: text (byte-identity invariant), simhash,
   stemmed term counts, links.  Checkpointed to Parquet (resume unit).
6. D3 simhash near-dup (window parity mode / LSH scale mode).
7. docs, texts, edges (url→docid resolution join, ``lib/reader.py:104-145``)
   and varbyte posting-list segments (the groupby(term) wide shuffle with
   hot-term salting) — each a checkpointed Parquet dataset with lineage.

Resume: re-running with the same ``out_dir`` skips completed stages
(StageCheckpoint manifests).  A global ``manifest.json`` (the reference's
mergeinfo, ``lib/writer.py:284-291``) commits last.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from searchengine_ray import params
from searchengine_ray.stages import dedup, postings as postings_mod
from searchengine_ray.stages.docid import zip_with_index
from searchengine_ray.stages.extract import (
    ExtractBatch,
    explode_links,
    explode_postings,
    extract_batch_task,
    page_keys,
)
from searchengine_ray.state.checkpoint import StageCheckpoint

MANIFEST = "manifest.json"

import numpy as np

from searchengine_ray.functions import hashing as _hashing


# the key families are computed distributed in the page_keys scan
# (extract.py); this alias keeps the probe-side call sites and tests
_url_ts_keys = _hashing.url_ts_keys


def _lookup_verified(
    keys_sorted: np.ndarray,
    keys2_sorted: np.ndarray,
    bkeys: np.ndarray,
    bkeys2: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-key broadcast lookup with a 128-bit collision guard.

    The lut is sorted by the primary 64-bit key; a hit is VERIFIED against
    an independent second 64-bit key (combined collision odds ~2^-128), so
    a collision can never silently mis-assign a docid (VERDICT r1 wrong#6).
    Both key arrays are plain uint64 — the broadcast stays zero-copy (a
    Python string array here re-pickles per task and anti-scales with
    CPUs; measured 0.73→0.53 on the 8v32 pair).  Unverified hits scan
    forward over the equal-primary-key run (length 1 except under a real
    64-bit collision).

    Returns (keep, pos): probe rows verified, and their lut positions.
    """
    pos = np.searchsorted(keys_sorted, bkeys)
    pos_c = np.minimum(pos, keys_sorted.size - 1)
    hit = keys_sorted[pos_c] == bkeys
    verified = hit & (keys2_sorted[pos_c] == bkeys2)
    for i in np.flatnonzero(hit & ~verified):
        p = pos_c[i] + 1
        while p < keys_sorted.size and keys_sorted[p] == bkeys[i]:
            if keys2_sorted[p] == bkeys2[i]:
                pos_c[i] = p
                verified[i] = True
                break
            p += 1
    return np.flatnonzero(verified), pos_c


EDGES_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _to_docs(batch: pa.Table) -> pa.Table:
    """Survivor rows → docs rows (S9 quality slots initialised to 1.0,
    ``lib/writer.py:143-151``)."""
    n = batch.num_rows
    return pa.table(
        {
            "docid": batch["docid"],
            "url": batch["url"],
            "total_tokens": batch["total_tokens"],
            "doc_len": batch["doc_len"],
            "pr_quality": pa.array([1.0] * n, pa.float32()),
            "hub_quality": pa.array([1.0] * n, pa.float32()),
            "auth_quality": pa.array([1.0] * n, pa.float32()),
        }
    )


def _resolve_links_tbl(
    batch: pa.Table,
    keys_sorted: np.ndarray,
    keys2_sorted: np.ndarray,
    docids_sorted: np.ndarray,
) -> pa.Table:
    """(src, dst_url) edge rows → (src, dst) via the broadcast url→docid
    LUT (J1 as a map-side lookup, 128-bit collision-guarded)."""
    if keys_sorted.size == 0 or batch.num_rows == 0:
        return EDGES_SCHEMA.empty_table()
    durls = batch["dst_url"].to_pylist()
    bkeys = _hashing.hash64_arr(durls)
    bkeys2 = _hashing.hash64_arr_b2(durls)
    keep, pos_c = _lookup_verified(keys_sorted, keys2_sorted, bkeys, bkeys2)
    return pa.table(
        {
            "src": pa.array(batch["src"].to_numpy()[keep], pa.int64()),
            "dst": pa.array(docids_sorted[pos_c[keep]], pa.int64()),
        }
    )


@ray.remote
def _survivor_block_parts(
    tbl: pa.Table,
    want_lut: bool,
    want_hot: bool,
    hot_threshold: int,
    num_docs: int,
) -> dict:
    """Per-block partials over the pinned survivor blocks, fetched with raw
    Ray tasks (locality-scheduled at the block's node) instead of a Dataset
    execution — each streaming-executor launch costs ~1.5-2 s of
    CPU-count-independent wall, the dominant term in the measured fixed
    overhead F (BASELINE.md round-3 F/W fit).

    Returns doc stats (n, max docid, Σdoc_len) always; the 128-bit
    url→docid LUT key family when ``want_lut``; and the thresholded
    hot-term ``value_counts`` partial when ``want_hot`` (same per-block
    floor/4-slack + exact driver-side ≥threshold cutoff as round 3's
    ``estimate_hot_terms_blockwise``)."""
    out: dict = {"n": tbl.num_rows, "max_docid": 0, "sum_dl": 0}
    if tbl.num_rows:
        out["max_docid"] = int(pc.max(tbl["docid"]).as_py())
        out["sum_dl"] = int(pc.sum(tbl["doc_len"]).as_py())
    if want_lut:
        urls = tbl["url"].to_pylist()
        out["k1"] = _hashing.hash64_arr(urls)
        out["k2"] = _hashing.hash64_arr_b2(urls)
        out["docid"] = tbl["docid"].to_numpy()
    if want_hot:
        out["hot_terms"], out["hot_counts"] = [], []
        if tbl.num_rows:
            terms = tbl["terms"]
            if isinstance(terms, pa.ChunkedArray):
                terms = terms.combine_chunks()
            vc = pc.value_counts(pc.list_flatten(terms))
            counts = vc.field("counts")
            floor = max(
                1, (hot_threshold * tbl.num_rows) // (max(num_docs, 1) * 4)
            )
            mask = pc.greater_equal(counts, floor)
            out["hot_terms"] = vc.field("values").filter(mask).to_pylist()
            out["hot_counts"] = counts.filter(mask).to_pylist()
    return out


@dataclass
class BuildResult:
    out_dir: str
    num_rows: int
    last_docid: int
    num_docs: int
    num_terms: int
    pruned_empty: int
    pruned_url: int
    pruned_exact: int
    pruned_neardup: int
    avgdl: float
    wall_s: dict
    neardup_engine: str = ""

    @property
    def docs_dir(self) -> str:
        return os.path.join(self.out_dir, "docs")

    @property
    def edges_dir(self) -> str:
        return os.path.join(self.out_dir, "edges")

    @property
    def segments_dir(self) -> str:
        return os.path.join(self.out_dir, "segments")

    @property
    def texts_dir(self) -> str:
        return os.path.join(self.out_dir, "texts")


def _load_manifest(out_dir: str) -> BuildResult | None:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    d.pop("config", None)
    return BuildResult(**d)


def build_index(
    pages: ray.data.Dataset,
    out_dir: str,
    cfg: params.BuildConfig | None = None,
    join_partitions: int | None = None,
) -> BuildResult:
    cfg = cfg or params.BuildConfig()
    done = _load_manifest(out_dir)
    if done is not None:
        return done
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if join_partitions is None:
        # each hash-join aggregator actor reserves 0.125 CPU; cap the pool at
        # half the cluster so map/actor stages are never starved (a 32-actor
        # join on a 4-CPU test cluster deadlocks the extract pool)
        join_partitions = max(2, min(64, cpus * 2))
    os.makedirs(out_dir, exist_ok=True)
    wall: dict[str, float] = {}

    # ---- 1-4: keys, docids, exact dedup, survivor join ------------------
    t0 = time.perf_counter()
    ck_extracted = StageCheckpoint(out_dir, "extracted")
    if ck_extracted.is_complete():
        extracted = ck_extracted.read()
        st = ck_extracted.load_manifest()
        num_rows = st["num_rows"]
        pruned_empty = st["pruned_empty"]
        pruned_url = st["pruned_url"]
        pruned_exact = st["pruned_exact"]
        # D2-survivor count (drives the near_dup_mode="auto" switch) without
        # re-executing the checkpointed dataset: survivors = rows in the
        # extracted checkpoint = input minus the three prune stages
        num_surv = num_rows - pruned_empty - pruned_url - pruned_exact
    else:
        keys = pages.map_batches(page_keys, batch_format="pyarrow")
        keys = keys.sort(["defrag_url", "url", "warc_ts"])
        keys = zip_with_index(keys, "docid")  # materializes the key table
        wall["keys_sort"] = time.perf_counter() - t0

        t1 = time.perf_counter()
        num_rows = keys.count()
        broadcast = num_rows <= cfg.broadcast_threshold
        lut_ref = None
        if broadcast:
            # driver path: the key table is small enough to broadcast anyway,
            # so D1/D2 run vectorized on the driver straight from the Arrow
            # refs (no groupby shuffles, no per-group Python)
            kt = pa.concat_tables(
                ray.get(keys.materialize().to_arrow_refs())
            ).combine_chunks()
            # keys are canonically sorted: equal defrag_urls are contiguous
            # and docid-ascending, so D1 = first non-empty row per group.
            # All column ops below are Arrow/numpy kernels — no Python rows.
            empty = kt["empty"].to_numpy(zero_copy_only=False)
            pruned_empty = int(empty.sum())
            nz = np.flatnonzero(~empty)
            dfr_nz = pc.take(kt["defrag_url"], pa.array(nz, pa.int64()))
            first_of_group = np.ones(nz.size, dtype=bool)
            if nz.size > 1:
                first_of_group[1:] = pc.not_equal(
                    dfr_nz.slice(1), dfr_nz.slice(0, nz.size - 1)
                ).to_numpy(zero_copy_only=False)
            d1_idx = nz[first_of_group]
            pruned_url = int(nz.size - d1_idx.size)
            # D2: global first-wins (min docid) per exact_hash among D1 rows.
            # d1_idx is docid-ascending (docids are monotone in sorted-key
            # order), and the 8-byte exact_hash views as uint64, so
            # np.unique's first-occurrence indices ARE the min-docid winners.
            h_d1 = pc.take(kt["exact_hash"], pa.array(d1_idx, pa.int64()))
            if d1_idx.size:
                fixed = (
                    h_d1.combine_chunks()
                    if isinstance(h_d1, pa.ChunkedArray)
                    else h_d1
                ).cast(pa.binary(8))
                h64 = np.frombuffer(fixed.buffers()[1], dtype=np.uint64)[
                    fixed.offset : fixed.offset + len(fixed)
                ]
            else:
                h64 = np.empty(0, np.uint64)
            _, first_occ = np.unique(h64, return_index=True)
            surv_idx = d1_idx[np.sort(first_occ)]
            pruned_exact = int(d1_idx.size - surv_idx.size)
            num_surv = int(surv_idx.size)
            sv = kt.take(pa.array(surv_idx, pa.int64()))
            # broadcast as ZERO-COPY numpy arrays (a Python dict/str-array
            # broadcast is re-unpickled by every task — measured
            # anti-scaling with CPUs): sorted 64-bit (url, warc_ts) keys +
            # an independent second key family for 128-bit collision-proof
            # verification + aligned docids.  Both families were computed
            # in the distributed page_keys scan (k1/k2 columns) — the
            # driver only slices them here
            sv_keys = sv["k1"].combine_chunks().to_numpy()
            sv_keys2 = sv["k2"].combine_chunks().to_numpy()
            order2 = np.argsort(sv_keys)
            lut_ref = ray.put(
                (
                    sv_keys[order2],
                    sv_keys2[order2],
                    sv["docid"].to_numpy()[order2],
                    sv["defrag_url"]
                    .combine_chunks()
                    .take(pa.array(order2)),
                )
            )
        else:
            # distributed path: D1 exploits the canonical sort (zero-
            # shuffle run starts + O(blocks) boundary stitch), D2 is one
            # 24 B/row min aggregate — no per-group Python, no full-width
            # key-table join (dedup.dedup_sorted docstring has the ×768
            # measurements that motivated this)
            survivors, dstats = dedup.dedup_sorted(
                keys, num_partitions=join_partitions
            )
            survivors = survivors.materialize()
            pruned_empty = dstats["n_empty"]
            d1_count = dstats["d1_count"]
            num_surv = dstats["d2_count"]
            pruned_url = num_rows - pruned_empty - d1_count
            pruned_exact = d1_count - num_surv
            if num_surv <= cfg.broadcast_threshold:
                # the attach gate keys off SURVIVORS, not input rows: a
                # heavy-dup corpus (3.84M pages → 214k docs at the ×768
                # bench) gets a few-MB (k1, k2, docid) LUT broadcast and
                # the html payload never rides a join shuffle
                sv_tabs = [
                    t
                    for t in ray.get(
                        survivors.select_columns(
                            ["k1", "k2", "docid", "defrag_url"]
                        )
                        .materialize()
                        .to_arrow_refs()
                    )
                    if t.num_rows  # zero-row blocks carry empty schemas
                ]
                if sv_tabs:
                    svt = pa.concat_tables(sv_tabs)
                    sv_keys = svt["k1"].combine_chunks().to_numpy()
                    sv_keys2 = svt["k2"].combine_chunks().to_numpy()
                    sv_ids = svt["docid"].combine_chunks().to_numpy()
                    sv_dfr = svt["defrag_url"].combine_chunks()
                else:
                    sv_keys = sv_keys2 = np.empty(0, np.uint64)
                    sv_ids = np.empty(0, np.int64)
                    sv_dfr = pa.array([], pa.string())
                order2 = np.argsort(sv_keys)
                # defrag_url rides the LUT (already computed by the keys
                # pass) so attach_ids never re-runs defrag() per row in
                # Python (VERDICT r4 next#2a); ≤2M survivors gate bounds
                # the broadcast at ~100s of MB worst case, put() once.
                lut_ref = ray.put(
                    (
                        sv_keys[order2],
                        sv_keys2[order2],
                        sv_ids[order2],
                        sv_dfr.take(pa.array(order2)),
                    )
                )
        wall["dedup"] = time.perf_counter() - t1
        t1 = time.perf_counter()

        if broadcast or lut_ref is not None:

            def attach_ids(batch: pa.Table) -> pa.Table:
                keys_sorted, keys2_sorted, docids_sorted, dfr_sorted = ray.get(
                    lut_ref
                )
                urls = batch["url"].to_pylist()
                ts = (
                    batch["warc_ts"].combine_chunks()
                    if isinstance(batch["warc_ts"], pa.ChunkedArray)
                    else batch["warc_ts"]
                ).cast(pa.int64()).to_numpy()
                if keys_sorted.size == 0:
                    return pa.Table.from_pydict(
                        {"docid": [], "defrag_url": [], "html": []},
                        schema=pa.schema(
                            [
                                ("docid", pa.int64()),
                                ("defrag_url", pa.string()),
                                ("html", pa.binary()),
                            ]
                        ),
                    )
                bkeys = _url_ts_keys(urls, ts)
                bkeys2 = _url_ts_keys(urls, ts, family=2)
                keep, pos_c = _lookup_verified(
                    keys_sorted, keys2_sorted, bkeys, bkeys2
                )
                sub = batch.select(["html"]).take(pa.array(keep, pa.int64()))
                hit_pos = pos_c[keep]
                return pa.table(
                    {
                        "docid": pa.array(docids_sorted[hit_pos], pa.int64()),
                        "defrag_url": dfr_sorted.take(
                            pa.array(hit_pos, pa.int64())
                        ),
                        "html": sub["html"],
                    }
                )

            with_html = pages.select_columns(["url", "warc_ts", "html"]).map_batches(
                attach_ids, batch_format="pyarrow"
            )
        else:
            with_html = pages.select_columns(["url", "warc_ts", "html"]).join(
                survivors.select_columns(["url", "warc_ts", "docid", "defrag_url"]),
                join_type="inner",
                num_partitions=join_partitions,
                on=("url", "warc_ts"),
            ).select_columns(["docid", "defrag_url", "html"])

        if cfg.extract_concurrency:
            ex = with_html.map_batches(
                ExtractBatch,
                fn_constructor_kwargs={
                    "importance_bug": cfg.importance_bug,
                    "emit_text": cfg.keep_text,
                    "mode": cfg.tokenizer,
                    "stemmer_mode": cfg.stemmer_mode,
                },
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
                concurrency=cfg.extract_concurrency,
            )
        else:
            # default: task pool with per-worker-process cached state (see
            # extract_batch_task) — same warm-state semantics, no actor
            # cold start
            import functools

            ex = with_html.map_batches(
                functools.partial(
                    extract_batch_task,
                    importance_bug=cfg.importance_bug,
                    emit_text=cfg.keep_text,
                    mode=cfg.tokenizer,
                    stemmer_mode=cfg.stemmer_mode,
                ),
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
            )
        extracted = ck_extracted.write(
            ex,
            num_rows=num_rows,
            pruned_empty=pruned_empty,
            pruned_url=pruned_url,
            pruned_exact=pruned_exact,
        )
        wall["extract_actors"] = time.perf_counter() - t1
    wall["extract"] = time.perf_counter() - t0

    # ---- 6: near-dup (D3) ----------------------------------------------
    t0 = time.perf_counter()
    near_dup_mode = cfg.near_dup_mode
    if cfg.simhash_bits != 32 and near_dup_mode in ("auto", "window"):
        # the 200-window parity scan is defined on the 32-bit reference
        # fingerprint; wider fingerprints always take the distributed path
        near_dup_mode = "lsh"
    if near_dup_mode == "auto":
        # parity window below the threshold, distributed Hamming-ball above
        # (documented semantic divergence: global vs 200-window; SURVEY D3)
        near_dup_mode = (
            "window" if num_surv <= dedup.AUTO_WINDOW_THRESHOLD else "lsh"
        )
    neardup_engine = "off"
    survivors_ex = None
    if near_dup_mode == "window":
        neardup_engine = "window"
        # (docid, simhash) read straight from the extract checkpoint's
        # Parquet column chunks on the driver (8-12 B/doc, and the window
        # scan is driver-serial anyway) — skips one executor launch
        t_ns = pq.read_table(ck_extracted.dir, columns=["docid", "simhash"])
        if t_ns.num_rows:
            t_ns = t_ns.take(
                pc.sort_indices(t_ns, sort_keys=[("docid", "ascending")])
            )
            pruned_arr = np.sort(
                np.fromiter(
                    dedup.window_prune(
                        t_ns["docid"].to_numpy(),
                        t_ns["simhash"].to_numpy().astype(np.uint32),
                    ),
                    dtype=np.int64,
                )
            )
        else:
            pruned_arr = np.empty(0, dtype=np.int64)
    elif (
        near_dup_mode == "lsh"
        and cfg.simhash_bits == 32
        and num_surv <= dedup.AUTO_DISTRIBUTED_THRESHOLD
    ):
        neardup_engine = "lsh_driver_merge"
        # driver distinct-merge path (fastest at ≤2^32 distinct values):
        # the threshold table prunes extracted in the SAME pass that
        # materializes the survivors — no separate pruned-docid execution
        t_thr = time.perf_counter()
        thr_tab = dedup.lsh_threshold_arrays(extracted)
        wall["neardup_thr"] = time.perf_counter() - t_thr
        if thr_tab is None:
            pruned_arr = np.empty(0, dtype=np.int64)
        else:
            thr_ref = ray.put(thr_tab)

            def keep_below_thr(batch: pa.Table) -> pa.Table:
                sv_t, thr_t = ray.get(thr_ref)  # zero-copy numpy
                sims = batch["simhash"].to_numpy().astype(np.uint32)
                docids = batch["docid"].to_numpy()
                pos = np.minimum(np.searchsorted(sv_t, sims), sv_t.size - 1)
                return batch.filter(pa.array(docids <= thr_t[pos]))

            t_mat = time.perf_counter()
            survivors_ex = extracted.map_batches(
                keep_below_thr, batch_format="pyarrow"
            ).materialize()
            pruned_neardup = num_surv - survivors_ex.count()
            wall["neardup_mat"] = time.perf_counter() - t_mat
    elif near_dup_mode == "lsh":
        # O(1)-driver shuffle path — auto-selected above
        # AUTO_DISTRIBUTED_THRESHOLD survivors (where the driver
        # distinct-merge and 512 MB bitmap stop being the fast path) or at
        # 64-bit fingerprints; also the ≥10^9-doc path
        neardup_engine = "lsh_distributed"
        pruned_ds = dedup.simhash_prune_lsh_distributed(
            extracted, bits=cfg.simhash_bits
        )
        pt = pa.concat_tables(ray.get(pruned_ds.materialize().to_arrow_refs()))
        pruned_arr = np.sort(pt["docid"].to_numpy())
    else:
        pruned_arr = np.empty(0, dtype=np.int64)
    if survivors_ex is None:
        pruned_neardup = int(pruned_arr.size)
        if pruned_arr.size:
            pruned_ref = ray.put(pruned_arr)

            def drop_pruned(batch: pa.Table) -> pa.Table:
                arr = ray.get(pruned_ref)  # zero-copy numpy
                docids = batch["docid"].to_numpy()
                pos = np.searchsorted(arr, docids)
                pos_c = np.minimum(pos, arr.size - 1)
                mask = arr[pos_c] != docids
                return batch.filter(pa.array(mask))

            survivors_ex = extracted.map_batches(
                drop_pruned, batch_format="pyarrow"
            )
        else:
            survivors_ex = extracted
        # four consumers follow (docs, texts, edges, postings): pin the
        # blocks in the object store once instead of re-reading the
        # checkpoint per consumer
        survivors_ex = survivors_ex.materialize()
    wall["neardup"] = time.perf_counter() - t0

    # ---- 7a: block partials (stats + edge LUT + hot-term estimate) ------
    # Raw Ray tasks over the pinned survivor blocks replace three separate
    # streaming executions round 3 paid here (docs.aggregate, the edge-LUT
    # materialize, the hot-term map_batches) — each launch is ~1.5-2 s of
    # fixed wall (BASELINE.md F/W fit: F ≈ 40 s capped ×192 scaling).
    t0 = time.perf_counter()
    ck_docs = StageCheckpoint(out_dir, "docs")
    ck_texts = StageCheckpoint(out_dir, "texts")
    ck_edges = StageCheckpoint(out_dir, "edges")
    ck_seg = StageCheckpoint(out_dir, "segments")
    docs_done = ck_docs.is_complete()
    texts_done = (not cfg.keep_text) or ck_texts.is_complete()
    edges_done = ck_edges.is_complete()

    num_docs = survivors_ex.count()  # metadata-only: blocks are pinned
    last_docid = 0
    avgdl = 0.0
    need_stats = True
    if docs_done:
        st_docs = ck_docs.load_manifest()
        if "num_docs" in st_docs:  # stats recorded at write time
            num_docs = st_docs["num_docs"]
            last_docid = st_docs["last_docid"]
            avgdl = st_docs["avgdl"]
            need_stats = False
    broadcast_edges = num_docs <= cfg.broadcast_threshold
    need_lut = (not edges_done) and broadcast_edges
    need_hot = (
        not ck_seg.is_complete()
        and bool(cfg.hot_term_df_threshold)
        and num_docs > cfg.hot_term_df_threshold
    )
    hot: set[str] = set()
    url_lut_ref = None
    if need_stats or need_lut or need_hot:
        parts = ray.get(
            [
                _survivor_block_parts.remote(
                    r, need_lut, need_hot, cfg.hot_term_df_threshold, num_docs
                )
                for r in survivors_ex.to_arrow_refs()
            ]
        )
        if need_stats:
            n_total = sum(p["n"] for p in parts)
            last_docid = max((p["max_docid"] for p in parts), default=0)
            avgdl = (
                sum(p["sum_dl"] for p in parts) / n_total if n_total else 0.0
            )
        if need_lut:
            ukeys = np.concatenate(
                [p["k1"] for p in parts] or [np.empty(0, np.uint64)]
            )
            ukeys2 = np.concatenate(
                [p["k2"] for p in parts] or [np.empty(0, np.uint64)]
            )
            udocids = np.concatenate(
                [p["docid"] for p in parts] or [np.empty(0, np.int64)]
            )
            uorder = np.argsort(ukeys)
            url_lut_ref = ray.put(
                (ukeys[uorder], ukeys2[uorder], udocids[uorder])
            )
        if need_hot:
            agg: dict[str, int] = {}
            for p in parts:
                for term, n in zip(p["hot_terms"], p["hot_counts"]):
                    agg[term] = agg.get(term, 0) + n
            # exact final cutoff (a /2 slack here measured 2× on the whole
            # segments stage — commit "Fix hot-term cutoff regression")
            hot = {
                t for t, n in agg.items() if n >= cfg.hot_term_df_threshold
            }
    wall["block_stats"] = time.perf_counter() - t0

    # ---- 7b: docs + texts + edges in ONE streaming execution ------------
    # texts and edges stream out as per-batch side-sink Parquet files
    # (deterministic min-docid filenames — idempotent under task retry;
    # batches are disjoint docid ranges), docs through the checkpoint
    # writer; manifests commit only after the execution succeeds, so a
    # crash mid-pass leaves no manifest and resume wipes the partials.
    # On a multi-node cluster out_dir is shared storage — the same
    # assumption write_parquet itself makes.
    t0 = time.perf_counter()
    if not docs_done:
        write_texts = cfg.keep_text and not texts_done
        write_edges = need_lut  # join-path edges run separately below
        import shutil

        for flag, ck in ((write_texts, ck_texts), (write_edges, ck_edges)):
            if flag:
                if os.path.exists(ck.dir):
                    shutil.rmtree(ck.dir)
                os.makedirs(ck.dir, exist_ok=True)
        texts_dir, edges_dir = ck_texts.dir, ck_edges.dir
        lut_for_edges = url_lut_ref

        def _atomic_write(tbl: pa.Table, path: str) -> None:
            # tmp-then-rename: concurrent task attempts racing the same
            # deterministic stem each complete a private tmp and the last
            # rename wins whole — a retry can never truncate a completed
            # file in place (the failure mode CheckpointValidationError
            # guards against at the stage level)
            tmp = f"{path}.{os.getpid()}.tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)

        def fused(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _to_docs(batch)
            stem = f"part-{batch['docid'][0].as_py():012d}.parquet"
            if write_texts:
                _atomic_write(
                    batch.select(["docid", "url", "text"]),
                    os.path.join(texts_dir, stem),
                )
            if write_edges:
                ks, ks2, dids = ray.get(lut_for_edges)
                e = _resolve_links_tbl(explode_links(batch), ks, ks2, dids)
                if e.num_rows:
                    _atomic_write(e, os.path.join(edges_dir, stem))
            return _to_docs(batch)

        ck_docs.write(
            survivors_ex.map_batches(fused, batch_format="pyarrow"),
            pruned_neardup=pruned_neardup,
            num_docs=num_docs,
            last_docid=last_docid,
            avgdl=avgdl,
        )
        if write_texts:
            ck_texts.commit()
            texts_done = True
        if write_edges:
            if not any(
                n.endswith(".parquet") for n in os.listdir(edges_dir)
            ):  # all-empty edge set: keep the checkpoint readable
                pq.write_table(
                    EDGES_SCHEMA.empty_table(),
                    os.path.join(edges_dir, "part-empty.parquet"),
                )
            ck_edges.commit()
            edges_done = True
    wall["docs"] = time.perf_counter() - t0

    # ---- 7c: resume combinations + join-path edges ----------------------
    t0 = time.perf_counter()
    if cfg.keep_text and not texts_done:
        ck_texts.write(survivors_ex.select_columns(["docid", "url", "text"]))
    if not edges_done:
        raw_edges = survivors_ex.map_batches(
            explode_links, batch_format="pyarrow"
        )
        if broadcast_edges:
            lut = url_lut_ref

            def resolve(batch: pa.Table) -> pa.Table:
                ks, ks2, dids = ray.get(lut)
                return _resolve_links_tbl(batch, ks, ks2, dids)

            edges = raw_edges.map_batches(resolve, batch_format="pyarrow")
        else:
            # url→docid resolution as a cluster-sized hash join (J1 above
            # the broadcast threshold) — joins the pinned survivors, not a
            # re-read of the docs Parquet
            resolved = raw_edges.join(
                survivors_ex.select_columns(["url", "docid"]),
                join_type="inner",
                num_partitions=join_partitions,
                on=("dst_url",),
                right_on=("url",),
            )
            edges = resolved.map_batches(
                lambda t: pa.table({"src": t["src"], "dst": t["docid"]}),
                batch_format="pyarrow",
            )
        ck_edges.write(edges)
    wall["edges"] = time.perf_counter() - t0

    # ---- 7d: posting-list segments (A1, the wide shuffle) ---------------
    t0 = time.perf_counter()
    if ck_seg.is_complete():
        num_terms = ck_seg.load_manifest()["num_terms"]
    else:
        flat = survivors_ex.map_batches(explode_postings, batch_format="pyarrow")
        segments = postings_mod.build_segments(
            flat,
            avgdl=avgdl,
            max_docid=last_docid,
            hot_terms=hot,
            num_salts=cfg.hot_term_salts,
            num_buckets=cfg.num_term_buckets,
        )
        seg_dir = ck_seg.dir
        import shutil

        if os.path.exists(seg_dir):
            shutil.rmtree(seg_dir)
        t1 = time.perf_counter()
        segments.write_parquet(
            seg_dir,
            partition_cols=["bucket"],
            # small row groups = the query engine's seek granularity (the
            # footer min/max term stats per row group are the ".seek" file)
            row_group_size=params.SEGMENT_ROW_GROUP_SIZE,
        )
        wall["segments_shuffle_write"] = time.perf_counter() - t1
        # row count from the Parquet footers (metadata-only driver read)
        # instead of a read_parquet().count() execution
        num_terms = 0
        for root_, _, names in os.walk(seg_dir):
            for nme in names:
                if nme.endswith(".parquet"):
                    num_terms += pq.ParquetFile(
                        os.path.join(root_, nme)
                    ).metadata.num_rows
        ck_seg.commit(num_terms=num_terms, hot_terms=sorted(hot))
    wall["segments"] = time.perf_counter() - t0

    result = BuildResult(
        out_dir=out_dir,
        num_rows=num_rows,
        last_docid=last_docid,
        num_docs=num_docs,
        num_terms=num_terms,
        pruned_empty=pruned_empty,
        pruned_url=pruned_url,
        pruned_exact=pruned_exact,
        pruned_neardup=pruned_neardup,
        avgdl=float(avgdl),
        wall_s=wall,
        neardup_engine=neardup_engine,
    )
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({**result.__dict__, "config": cfg.__dict__}, f, indent=1, default=str)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return result
