"""Posting-list construction: THE wide shuffle (SURVEY.md §2.5 A1, §4).

``(term, docid, tf, important, doc_len)`` tuples are groupby-shuffled and
reduced into compressed posting lists:

    term, df, docids_vb (delta+varbyte), tfs_vb (varbyte),
    fields (1 byte/posting), block_last (list<int64>),
    block_bound (list<float32>), bucket (hash partition)

**Shard-level reduction.**  A naive ``groupby("term").map_groups`` pays one
Python call per term (10^6+ term groups at web scale).  Instead terms are
hash-partitioned into ~2×CPU *shards* aligned to the output buckets
(``shard % num_buckets == bucket`` so each encoded block lands in exactly
one bucket dir), and each shard's terms are encoded in ONE vectorized pass
(sort by (term, docid), slice at term boundaries).

**Skew handling** (north_rule).  Zipfian head terms produce posting lists
far larger than one reducer should hold.  Terms whose *sampled* df exceeds
``hot_term_df_threshold`` are salted by docid range —
``salt = docid // ceil(max_docid/S)`` — so a hot term becomes ≤S disjoint,
docid-ordered runs encoded on different reducers; a second, cheap
shard-level pass concatenates runs per term (runs ship compressed).  Cold
terms take salt 0 and pass through the merge untouched.

Hot-term detection samples the postings stream and scales the counts (an
exact first-pass ``groupby(term).count()`` would itself be the shuffle
we're protecting).  Over-selection is harmless; under-selection leaves one
oversized group (correct, slower).

The block-max metadata is the BM25 upper bound per 128-posting block
(``max tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``; the per-term idf applies at
query time), enabling the block-max WAND top-k mode.  The reference has no
compression or block metadata (fixed 16-byte postings,
``lib/posting.py:45-62``).
"""

from __future__ import annotations

import zlib

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

_RUN_EXTRA = [("salt", pa.int32()), ("min_docid", pa.int64())]
RUN_SCHEMA = pa.schema(list(SEGMENT_SCHEMA) + [pa.field(n, t) for n, t in _RUN_EXTRA])


def _crc_bucket(term: str, num_buckets: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def _term_crc_per_row(col, modulo: int) -> np.ndarray:
    """crc32(term) % modulo per row, hashing only batch-unique terms."""
    dic = pc.dictionary_encode(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    uniq = np.array(
        [zlib.crc32(t.encode("utf-8")) for t in dic.dictionary.to_pylist()],
        dtype=np.uint64,
    )
    return (uniq % modulo).astype(np.int64)[dic.indices.to_numpy()]


def estimate_hot_terms_blockwise(
    survivors: ray.data.Dataset, threshold: int, num_docs: int
) -> set[str]:
    """Heavy-hitter df estimate in ONE vectorized pass over the
    materialized survivor blocks — replaces the explode → random_sample →
    ``groupby(term)`` execution (a ~docs×terms row expansion plus a
    shuffle, ~6 s fixed at 960k pages) with per-block ``value_counts`` on
    the flattened terms column.

    Each block keeps terms whose block df ≥ threshold scaled to the block
    size over 4 (4× slack against block skew — only the per-block FILTER
    is slackened); the driver sums the partials and keeps terms with
    summed df ≥ threshold.  The final cutoff is exact on purpose: an
    over-inclusive hot set flips the build into the two-phase salted
    shuffle for terms that don't need it (measured 2× on the whole
    segments stage at 8 CPUs when a /2 cutoff admitted 30 terms).
    """

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch["terms"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        flat = pc.list_flatten(terms)
        vc = pc.value_counts(flat)
        counts = vc.field("counts")
        floor = max(1, (threshold * batch.num_rows) // (max(num_docs, 1) * 4))
        mask = pc.greater_equal(counts, floor)
        return pa.table(
            {
                "term": vc.field("values").filter(mask),
                "n": counts.filter(mask),
            }
        )

    agg: dict[str, int] = {}
    for row in (
        survivors.select_columns(["terms"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    ):
        agg[row["term"]] = agg.get(row["term"], 0) + row["n"]
    return {t for t, n in agg.items() if n >= threshold}


def bm25_tf_bound(tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float) -> np.ndarray:
    """Per-posting BM25 tf-saturation term (idf excluded)."""
    k1, b = params.BM25_K1, params.BM25_B
    tf = tfs.astype(np.float64)
    dl = doc_lens.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9))
    return tf * (k1 + 1.0) / denom


class _ShardEncode:
    """Encode ALL (term[, salt]) runs of one shard in a single vectorized
    pass: sort by (term, docid) — salts are disjoint docid ranges, so runs
    are contiguous slices — then varbyte each slice.

    ``with_runs=False`` emits SEGMENT_SCHEMA (final, salt-free path);
    ``with_runs=True`` adds (salt, min_docid) for the merge phase.
    """

    def __init__(
        self, avgdl: float, block_size: int, num_buckets: int, with_runs: bool
    ) -> None:
        self.avgdl = avgdl
        self.block_size = block_size
        self.num_buckets = num_buckets
        self.with_runs = with_runs

    def __call__(self, group: pa.Table) -> pa.Table:
        sort_cols = [("term", "ascending"), ("docid", "ascending")]
        idx = pc.sort_indices(group, sort_keys=sort_cols)
        g = group.take(idx)
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        docids = g["docid"].to_numpy()
        tfs = g["tf"].to_numpy()
        imps = g["important"].to_numpy().astype(np.uint8)
        dls = g["doc_len"].to_numpy()
        salts = (
            g["salt"].to_numpy() if self.with_runs and "salt" in g.column_names
            else np.zeros(len(terms), dtype=np.int64)
        )
        bounds_all = bm25_tf_bound(tfs, dls, self.avgdl)

        change = np.ones(len(terms), dtype=bool)
        if len(terms) > 1:
            change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(terms))

        out: dict[str, list] = {n: [] for n in RUN_SCHEMA.names}
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
            out["bucket"].append(_crc_bucket(t, self.num_buckets))
            out["salt"].append(int(salts[s]))
            out["min_docid"].append(int(d[0]))
        if not self.with_runs:
            out.pop("salt")
            out.pop("min_docid")
            return pa.Table.from_pydict(out, schema=SEGMENT_SCHEMA)
        return pa.Table.from_pydict(out, schema=RUN_SCHEMA)


class _ShardMergeRuns:
    """Merge the salted runs of each term inside one merge-shard: runs ship
    compressed; single-run terms (the cold majority) pass through without
    decode; multi-run terms decode, concat in min_docid order, re-encode.
    Merged block bounds take the max contributing run bound per new block —
    conservative (≥ true bound), safe for WAND."""

    def __init__(self, block_size: int) -> None:
        self.block_size = block_size

    def __call__(self, group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("term", "ascending"), ("min_docid", "ascending")]
        )
        g = group.take(idx)
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        change = np.ones(len(terms), dtype=bool)
        if len(terms) > 1:
            change[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(terms))

        single = (ends - starts) == 1
        out_tables = []
        passthrough_idx = starts[single]
        if passthrough_idx.size:
            out_tables.append(
                g.take(pa.array(passthrough_idx, pa.int64())).drop_columns(
                    ["salt", "min_docid"]
                )
            )

        multi = {n: [] for n in SEGMENT_SCHEMA.names}
        for s, e in zip(starts[~single], ends[~single]):
            # materialize ONLY this term's runs (hot terms are few; the
            # cold majority passed through above without row conversion)
            parts = g.slice(s, e - s).to_pylist()
            docids = np.concatenate(
                [
                    varbyte.delta_decode(varbyte.vb_decode(p["docids_vb"]))
                    for p in parts
                ]
            ).astype(np.int64)
            tfs = np.concatenate(
                [varbyte.vb_decode(p["tfs_vb"]) for p in parts]
            ).astype(np.int64)
            fields = b"".join(p["fields"] for p in parts)
            bounds = np.concatenate(
                [
                    np.repeat(
                        np.asarray(p["block_bound"], dtype=np.float32),
                        self.block_size,
                    )[: p["df"]]
                    for p in parts
                ]
            )
            dvb, tvb = varbyte.encode_postings(docids, tfs)
            blast, bbound = varbyte.block_max(docids, bounds, self.block_size)
            multi["term"].append(parts[0]["term"])
            multi["df"].append(len(docids))
            multi["docids_vb"].append(dvb)
            multi["tfs_vb"].append(tvb)
            multi["fields"].append(fields)
            multi["block_last"].append(blast.tolist())
            multi["block_bound"].append(bbound.tolist())
            multi["bucket"].append(parts[0]["bucket"])
        if multi["term"]:
            out_tables.append(pa.Table.from_pydict(multi, schema=SEGMENT_SCHEMA))
        if not out_tables:
            return pa.Table.from_pydict(
                {n: [] for n in SEGMENT_SCHEMA.names}, schema=SEGMENT_SCHEMA
            )
        return pa.concat_tables(out_tables)


def _num_shards(num_buckets: int) -> int:
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    # multiple of num_buckets so shard % num_buckets == bucket (single
    # bucket dir per encoded block in the partitioned write)
    return num_buckets * max(1, round(cpus * 2 / num_buckets))


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
    num_shards = _num_shards(num_buckets)

    if not hot_terms:
        encode = _ShardEncode(avgdl, block_size, num_buckets, with_runs=False)

        def add_shard(batch: pa.Table) -> pa.Table:
            shards = _term_crc_per_row(batch["term"], num_shards).astype(np.int32)
            return batch.append_column("shard", pa.array(shards, pa.int32()))

        def encode_shard(group: pa.Table) -> pa.Table:
            return encode(group)

        return (
            postings.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(encode_shard, batch_format="pyarrow")
        )

    # ---- salted two-phase path -----------------------------------------
    hot_set = frozenset(hot_terms)
    range_size = max(1, -(-max_docid // num_salts))  # ceil
    run_encode = _ShardEncode(avgdl, block_size, num_buckets, with_runs=True)
    merge = _ShardMergeRuns(block_size)

    def add_salt_shard(batch: pa.Table) -> pa.Table:
        col = batch["term"]
        dic = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        uniq_terms = dic.dictionary.to_pylist()
        uniq_hot = np.array([t in hot_set for t in uniq_terms])
        uniq_crc = np.array(
            [zlib.crc32(t.encode("utf-8")) for t in uniq_terms], dtype=np.uint64
        )
        inds = dic.indices.to_numpy()
        hot_rows = uniq_hot[inds]
        docids = batch["docid"].to_numpy()
        salt = np.where(hot_rows, docids // range_size, 0).astype(np.int32)
        # runs of one term spread across reducers: mix salt into the shard key
        shard = (
            (uniq_crc[inds] + salt.astype(np.uint64) * np.uint64(0x9E3779B1))
            % num_shards
        ).astype(np.int32)
        return batch.append_column(
            "salt", pa.array(salt, pa.int32())
        ).append_column("shard", pa.array(shard, pa.int32()))

    def encode_run_shard(group: pa.Table) -> pa.Table:
        return run_encode(group.drop_columns(["shard"]))

    def add_merge_shard(batch: pa.Table) -> pa.Table:
        shards = _term_crc_per_row(batch["term"], num_shards).astype(np.int32)
        return batch.append_column("mshard", pa.array(shards, pa.int32()))

    def merge_shard(group: pa.Table) -> pa.Table:
        return merge(group.drop_columns(["mshard"]))

    runs = (
        postings.map_batches(add_salt_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(encode_run_shard, batch_format="pyarrow")
    )
    return (
        runs.map_batches(add_merge_shard, batch_format="pyarrow")
        .groupby("mshard")
        .map_groups(merge_shard, batch_format="pyarrow")
    )


def decode_segment_row(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment row → (docids, tfs, importants) arrays (test/query helper)."""
    docids, tfs = varbyte.decode_postings(row["docids_vb"], row["tfs_vb"])
    fields = np.frombuffer(row["fields"], dtype=np.uint8).astype(np.int64)
    return docids, tfs, fields
