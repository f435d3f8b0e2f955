"""Posting-list construction: THE wide shuffle (SURVEY.md §2.5 A1, §4).

``(term, docid, tf, important, doc_len)`` tuples are groupby-shuffled by
term and reduced into compressed posting lists:

    term, df, docids_vb (delta+varbyte), tfs_vb (varbyte),
    fields (1 byte/posting), block_last (list<int64>),
    block_bound (list<float32>), bucket (hash partition)

Skew handling (north_rule): Zipfian head terms produce posting lists far
larger than a single reducer should hold.  Terms whose estimated df exceeds
``cfg.hot_term_df_threshold`` are *salted* by docid range —
``salt = docid // ceil(max_docid/S)`` — so each hot term becomes ≤S
moderate groups whose postings are disjoint, docid-ordered runs.  A second,
cheap groupby over the (already encoded, compressed) runs concatenates them
back into one list per term.  Cold terms take salt 0 and pass through the
merge trivially.

Hot-term detection samples a fraction of the postings stream and scales the
observed counts (a first-pass exact ``groupby(term).count()`` would itself
be the shuffle we're trying to protect).

The block-max metadata is the BM25 upper bound per 128-posting block
(``bound = max tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``; the per-term idf is
applied at query time), enabling block-max WAND for the BM25 top-k mode.
The reference has no compression or block metadata (fixed 16-byte postings,
``lib/posting.py:45-62``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from searchengine_ray import params
from searchengine_ray.functions import varbyte

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docids_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("fields", pa.binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_bound", pa.list_(pa.float32())),
        ("bucket", pa.int32()),
    ]
)


def term_bucket(terms: pa.Array | pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """Stable hash partition of terms (not Python ``hash`` — must be
    deterministic across processes)."""
    import zlib

    vals = [zlib.crc32(t.encode("utf-8")) % num_buckets for t in terms.to_pylist()]
    return pa.array(vals, pa.int32())


def estimate_hot_terms(
    postings: ray.data.Dataset, threshold: int, sample_fraction: float = 0.02
) -> set[str]:
    """Sampled df estimate: count terms in a ~``sample_fraction`` sample and
    scale.  Over-selection is harmless (extra salts merge cheaply);
    under-selection leaves one oversized group (correct, slower)."""
    if sample_fraction >= 1.0:
        sample = postings.select_columns(["term"])
    else:
        sample = postings.select_columns(["term"]).random_sample(sample_fraction)
    counts = sample.groupby("term").count()
    cutoff = max(1.0, threshold * sample_fraction)
    hot = counts.filter(expr=f"`count()` >= {cutoff}")
    return {r["term"] for r in hot.take_all()}


def bm25_tf_bound(
    tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float
) -> np.ndarray:
    """Per-posting BM25 tf-saturation term (idf excluded)."""
    k1, b = params.BM25_K1, params.BM25_B
    tf = tfs.astype(np.float64)
    dl = doc_lens.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9))
    return tf * (k1 + 1.0) / denom


class _EncodeGroup:
    """groupby(term[,salt]).map_groups reducer → one encoded posting run."""

    def __init__(self, avgdl: float, block_size: int, num_buckets: int) -> None:
        self.avgdl = avgdl
        self.block_size = block_size
        self.num_buckets = num_buckets

    def __call__(self, group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("docid", "ascending")])
        g = group.take(idx)
        docids = g["docid"].to_numpy()
        tfs = g["tf"].to_numpy()
        imps = g["important"].to_numpy()
        dls = g["doc_len"].to_numpy()
        term = g["term"][0].as_py()

        docids_vb, tfs_vb = varbyte.encode_postings(docids, tfs)
        bounds = bm25_tf_bound(tfs, dls, self.avgdl)
        block_last, block_bound = varbyte.block_max(docids, bounds, self.block_size)
        return pa.Table.from_pydict(
            {
                "term": [term],
                "df": [len(docids)],
                "docids_vb": [docids_vb],
                "tfs_vb": [tfs_vb],
                "fields": [imps.astype(np.uint8).tobytes()],
                "block_last": [block_last.tolist()],
                "block_bound": [block_bound.tolist()],
                "bucket": pa.array(
                    [_crc_bucket(term, self.num_buckets)], pa.int32()
                ),
            },
            schema=SEGMENT_SCHEMA,
        )


def _crc_bucket(term: str, num_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets


class _ShardEncode:
    """Encode ALL terms of one hash shard in a single vectorized pass:
    sort by (term, docid), slice per term via unique boundaries, varbyte
    each slice, emit one output table for the whole shard."""

    def __init__(self, avgdl: float, block_size: int, num_buckets: int) -> None:
        self.avgdl = avgdl
        self.block_size = block_size
        self.num_buckets = num_buckets

    def __call__(self, group: pa.Table) -> pa.Table:
        import zlib

        idx = pc.sort_indices(
            group, sort_keys=[("term", "ascending"), ("docid", "ascending")]
        )
        g = group.take(idx)
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        docids = g["docid"].to_numpy()
        tfs = g["tf"].to_numpy()
        imps = g["important"].to_numpy().astype(np.uint8)
        dls = g["doc_len"].to_numpy()
        bounds_all = bm25_tf_bound(tfs, dls, self.avgdl)

        # term boundaries in the sorted order
        change = np.ones(len(terms), dtype=bool)
        if len(terms) > 1:
            change[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(terms))

        out = {
            "term": [], "df": [], "docids_vb": [], "tfs_vb": [], "fields": [],
            "block_last": [], "block_bound": [], "bucket": [],
        }
        for s, e in zip(starts, ends):
            d = docids[s:e]
            dvb, tvb = varbyte.encode_postings(d, tfs[s:e])
            blast, bbound = varbyte.block_max(d, bounds_all[s:e], self.block_size)
            t = terms[s]
            out["term"].append(t)
            out["df"].append(e - s)
            out["docids_vb"].append(dvb)
            out["tfs_vb"].append(tvb)
            out["fields"].append(imps[s:e].tobytes())
            out["block_last"].append(blast.tolist())
            out["block_bound"].append(bbound.tolist())
            out["bucket"].append(zlib.crc32(t.encode("utf-8")) % self.num_buckets)
        return pa.Table.from_pydict(out, schema=SEGMENT_SCHEMA)


class _MergeRuns:
    """Second-phase reducer for salted hot terms: decode ≤S runs, concat,
    re-encode.  Runs are docid-disjoint ranges so concatenation in
    min-docid order is globally sorted."""

    def __init__(self, avgdl: float, block_size: int, num_buckets: int) -> None:
        self.avgdl = avgdl
        self.block_size = block_size
        self.num_buckets = num_buckets

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group.drop_columns(["salt", "min_docid"])
        idx = pc.sort_indices(group, sort_keys=[("min_docid", "ascending")])
        g = group.take(idx)
        term = g["term"][0].as_py()
        all_docids, all_tfs, all_fields = [], [], []
        for i in range(g.num_rows):
            d, t = varbyte.decode_postings(
                g["docids_vb"][i].as_py(), g["tfs_vb"][i].as_py()
            )
            all_docids.append(d)
            all_tfs.append(t)
            all_fields.append(np.frombuffer(g["fields"][i].as_py(), dtype=np.uint8))
        docids = np.concatenate(all_docids)
        tfs = np.concatenate(all_tfs)
        fields = np.concatenate(all_fields)

        docids_vb, tfs_vb = varbyte.encode_postings(docids, tfs)
        # per-posting doc_len is gone post-encode; recompute bound from the
        # stored per-run blocks is lossy, so the merged bound uses the max
        # run bound per new block — conservative (>= true bound), which is
        # safe for WAND. Simpler: take max over contributing run blocks.
        bounds = np.concatenate(
            [
                np.repeat(
                    np.asarray(g["block_bound"][i].as_py(), dtype=np.float32),
                    self.block_size,
                )[: len(all_docids[i])]
                for i in range(g.num_rows)
            ]
        )
        block_last, block_bound = varbyte.block_max(docids, bounds, self.block_size)
        return pa.Table.from_pydict(
            {
                "term": [term],
                "df": [len(docids)],
                "docids_vb": [docids_vb],
                "tfs_vb": [tfs_vb],
                "fields": [fields.tobytes()],
                "block_last": [block_last.tolist()],
                "block_bound": [block_bound.tolist()],
                "bucket": pa.array([_crc_bucket(term, self.num_buckets)], pa.int32()),
            },
            schema=SEGMENT_SCHEMA,
        )


def build_segments(
    postings: ray.data.Dataset,
    avgdl: float,
    max_docid: int,
    hot_terms: set[str] | None = None,
    num_salts: int = 32,
    block_size: int = params.BLOCK_MAX_SIZE,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """(term, docid, tf, important, doc_len) → encoded segments dataset."""
    encode = _EncodeGroup(avgdl, block_size, num_buckets)

    if not hot_terms:
        # shard-level reduce: hash-partition terms into ~2×CPU shards and
        # encode each shard's terms in one vectorized pass — ONE Python call per
        # shard instead of one per term (10^4-10^6 term groups otherwise)
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        # a multiple of num_buckets so shard % num_buckets == bucket: every
        # encoded shard block lands in exactly ONE bucket dir of the
        # partitioned write (otherwise shards × buckets small files)
        num_shards = num_buckets * max(1, round(cpus * 2 / num_buckets))
        shard_encode = _ShardEncode(avgdl, block_size, num_buckets)

        def add_shard(batch: pa.Table) -> pa.Table:
            import zlib

            # crc only the batch-unique terms (Zipfian repeats), then
            # scatter via dictionary indices — no per-row Python hash
            col = batch["term"]
            dic = pc.dictionary_encode(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            )
            uniq_shards = np.array(
                [
                    zlib.crc32(t.encode("utf-8")) % num_shards
                    for t in dic.dictionary.to_pylist()
                ],
                dtype=np.int32,
            )
            shards = uniq_shards[dic.indices.to_numpy()]
            return batch.append_column("shard", pa.array(shards, pa.int32()))

        def encode_shard(group: pa.Table) -> pa.Table:
            return shard_encode(group)

        return (
            postings.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(encode_shard, batch_format="pyarrow")
        )

    hot_list = sorted(hot_terms)
    range_size = max(1, -(-max_docid // num_salts))  # ceil

    def add_salt(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        docids = batch["docid"].to_numpy()
        hot = np.array([t in hot_set for t in terms])
        salt = np.where(hot, docids // range_size, 0).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, pa.int32()))

    hot_set = set(hot_list)
    run_encode = _RunEncode(encode)
    merge = _MergeRuns(avgdl, block_size, num_buckets)

    def encode_run(group: pa.Table) -> pa.Table:
        return run_encode(group)

    def merge_runs(group: pa.Table) -> pa.Table:
        return merge(group)

    salted = postings.map_batches(add_salt, batch_format="pyarrow")
    runs = salted.groupby(["term", "salt"]).map_groups(encode_run, batch_format="pyarrow")
    return runs.groupby("term").map_groups(merge_runs, batch_format="pyarrow")


class _RunEncode:
    """Wraps _EncodeGroup keeping (salt, min_docid) for the merge phase."""

    def __init__(self, encode: _EncodeGroup) -> None:
        self._encode = encode

    def __call__(self, group: pa.Table) -> pa.Table:
        out = self._encode(group)
        salt = group["salt"][0].as_py()
        min_docid = pc.min(group["docid"]).as_py()
        return out.append_column("salt", pa.array([salt], pa.int32())).append_column(
            "min_docid", pa.array([min_docid], pa.int64())
        )


def decode_segment_row(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment row → (docids, tfs, importants) arrays (test/query helper)."""
    docids, tfs = varbyte.decode_postings(row["docids_vb"], row["tfs_vb"])
    fields = np.frombuffer(row["fields"], dtype=np.uint8).astype(np.int64)
    return docids, tfs, fields
