"""Training-data-pipeline operators over the driver's test tables.

These are the large-scale data-processing operations a 100 TB corpus
pipeline needs beyond the reference's own operators (per the build brief):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), windowed aggregates, and relational joins/aggregates.

Each public function takes ``sf_dir`` and returns a Dataset / Arrow table;
``__ray_entry__.queries()`` exposes them and (where SQL-expressible)
``oracle_sql()`` carries the DuckDB equivalent.  SQL-checked operators use
the SQL-parity tokenizer (:func:`tokenizer.simple_tokens`) so DuckDB can
express the same tokenization; the reference search-engine tokenizer is
exercised by the pytest oracle-parity suite instead.

All heavy paths are Ray-Data-first: ``map_batches`` over Arrow batches,
partial aggregation before any groupby, broadcast small sides via
``ray.put``, no driver-side row loops over big data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from searchengine_ray.functions import hashing, tokenizer

# 174-word stopword list is large for inline SQL; use a compact fixed subset
# shared verbatim between the Ray op and the SQL oracle.
SQL_STOPWORDS = (
    "the a an of to and in is it that for on with as at by from or be are "
    "was were this which not have has had but they you we he she his her "
    "its their our your my i"
).split()


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _docs_text(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


# ------------------------------------------------------------ text analysis


def term_df(sf_dir: str) -> ray.data.Dataset:
    """Document frequency per term (simple tokenization).

    Map-side partial: per-batch DISTINCT (term, doc) pairs collapse before
    the term shuffle.
    """

    def distinct_terms(batch: pa.Table) -> pa.Table:
        terms, ids = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for t in set(tokenizer.simple_tokens(text or "")):
                terms.append(t)
                ids.append(doc_id)
        return pa.table(
            {"term": pa.array(terms, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )

    out = (
        _docs_text(sf_dir)
        .map_batches(distinct_terms, batch_format="pyarrow")
        .groupby("term")
        .count()
    )
    return out.map_batches(
        lambda t: pa.table({"term": t["term"], "df": t["count()"]}),
        batch_format="pyarrow",
    )


def postings_simple(sf_dir: str) -> ray.data.Dataset:
    """(term, doc_id, tf) tuples — the posting-explode shape, SQL-checkable."""

    def counts(batch: pa.Table) -> pa.Table:
        terms, ids, tfs = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for t, c in tokenizer.word_count(
                tokenizer.simple_tokens(text or "")
            ).items():
                terms.append(t)
                ids.append(doc_id)
                tfs.append(c)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    return _docs_text(sf_dir).map_batches(counts, batch_format="pyarrow")


def top_terms(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Top-k terms by total occurrences (tie-break term asc)."""
    totals = (
        postings_simple(sf_dir)
        .groupby("term")
        .sum("tf")
        .map_batches(
            lambda t: pa.table({"term": t["term"], "total_tf": t["sum(tf)"]}),
            batch_format="pyarrow",
        )
    )
    return totals.sort(["total_tf", "term"], descending=[True, False]).limit(k)


def doc_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-doc token counts: n_tokens, n_unique, n_stop (quality-scoring
    ingredients; integers so the DuckDB comparison is exact)."""
    stop = frozenset(SQL_STOPWORDS)

    def stats(batch: pa.Table) -> pa.Table:
        ids, n_tok, n_uni, n_stop = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenizer.simple_tokens(text or "")
            ids.append(doc_id)
            n_tok.append(len(toks))
            n_uni.append(len(set(toks)))
            n_stop.append(sum(1 for t in toks if t in stop))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_unique": pa.array(n_uni, pa.int64()),
                "n_stop": pa.array(n_stop, pa.int64()),
            }
        )

    return _docs_text(sf_dir).map_batches(stats, batch_format="pyarrow")


def language_id(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID: stopword-hit ratio over the English function
    words above → 'en' vs 'other' (n-gram-free but distributable shape;
    real models slot into the same actor stage).  SQL-expressible, so the
    oracle checks it exactly."""
    stop = frozenset(SQL_STOPWORDS)

    def lid(batch: pa.Table) -> pa.Table:
        ids, langs = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenizer.simple_tokens(text or "")
            hits = sum(1 for t in toks if t in stop)
            langs.append("en" if toks and hits * 20 >= len(toks) else "other")
            ids.append(doc_id)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_lang": pa.array(langs, pa.string()),
            }
        )

    return _docs_text(sf_dir).map_batches(lid, batch_format="pyarrow")


_BPE_ISH = __import__("re").compile(
    r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]+|\s+(?=\S)"
)

_LANG_TRIGRAMS = {
    # top character trigrams per language family (space-padded), tiny
    # fixed profiles — the distributable shape of a real langid model
    "en": ["the", "he ", " th", "ing", "and", " an", "er ", " of", "of ", "ed "],
    "de": ["er ", "en ", "ch ", "der", " de", "sch", "ie ", "ein", "die", "und"],
    "fr": ["es ", " de", "de ", "le ", "ent", " le", "ne ", "la ", " la", "tio"],
    "es": [" de", "de ", "os ", "la ", " la", "el ", " el", "ión", "es ", "ent"],
}


def token_count_bpe(sf_dir: str) -> ray.data.Dataset:
    """Token counting with a BPE-ish pre-tokenizer regex (letters runs,
    short digit groups, punctuation runs — the GPT-2-style split shape) vs
    whitespace tokens.  Returns per-doc (n_ws_tokens, n_bpe_tokens) —
    training-data budgeting ingredients."""

    def counts(batch: pa.Table) -> pa.Table:
        ids, ws, bpe = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t = text or ""
            ids.append(doc_id)
            ws.append(len(t.split()))
            bpe.append(sum(1 for _ in _BPE_ISH.finditer(t)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_ws_tokens": pa.array(ws, pa.int64()),
                "n_bpe_tokens": pa.array(bpe, pa.int64()),
            }
        )

    return _docs_text(sf_dir).map_batches(counts, batch_format="pyarrow")


class LangIdTrigram:
    """Char-trigram language ID as a stateful batch stage: the profile
    tables compile once per worker; ``__call__`` scores batches.  Returns
    the argmax profile by trigram-hit rate ('und' when no profile hits)."""

    def __init__(self) -> None:
        self.profiles = {
            lang: frozenset(tris) for lang, tris in _LANG_TRIGRAMS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, langs = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t = f" {(text or '').lower()} "
            grams = [t[i : i + 3] for i in range(len(t) - 2)]
            best, best_hits = "und", 0
            for lang, prof in self.profiles.items():
                hits = sum(1 for g in grams if g in prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            ids.append(doc_id)
            langs.append(best)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_lang": pa.array(langs, pa.string()),
            }
        )


def language_id_trigram(sf_dir: str) -> ray.data.Dataset:
    """N-gram-heuristic language ID (char trigram profiles)."""
    return _docs_text(sf_dir).map_batches(
        LangIdTrigram, batch_format="pyarrow", concurrency=(1, 4), batch_size=256
    )


def fingerprint(sf_dir: str, w: int = 8, window: int = 4) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer et al. 2003): rolling
    CRC64 over ``w``-token shingles, per ``window`` keep the min hash.
    Returns per-doc fingerprint count and min/max fingerprint (ints)."""

    def fp(batch: pa.Table) -> pa.Table:
        ids, counts, mins, maxs = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenizer.simple_tokens(text or "")
            hs = [
                hashing.crc64(" ".join(toks[i : i + w]).encode()) & 0x7FFFFFFFFFFFFFFF
                for i in range(max(0, len(toks) - w + 1))
            ]
            sel = {
                min(hs[i : i + window])
                for i in range(max(0, len(hs) - window + 1))
            } or {0}
            ids.append(doc_id)
            counts.append(len(sel))
            mins.append(min(sel))
            maxs.append(max(sel))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_fp": pa.array(counts, pa.int64()),
                "min_fp": pa.array(mins, pa.int64()),
                "max_fp": pa.array(maxs, pa.int64()),
            }
        )

    return _docs_text(sf_dir).map_batches(fp, batch_format="pyarrow")


# ------------------------------------------------------------- deduplication


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact text dedup: one row per distinct text — surviving (min) doc_id
    and duplicate count.  Hash-groupby on the text key."""
    out = (
        _docs_text(sf_dir)
        .groupby("text")
        .aggregate(
            ray.data.aggregate.Min("doc_id"), ray.data.aggregate.Count()
        )
    )
    return out.map_batches(
        lambda t: pa.table(
            {"keep_id": t["min(doc_id)"], "n_dups": t["count()"]}
        ),
        batch_format="pyarrow",
    )


def _shingles(toks: list[str], n: int = 3) -> set[str]:
    return {" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))} or {""}


_MINHASH_PERMS = 64
_MH_A = np.array(
    [hashing.crc64(f"mh-a-{i}".encode()) | 1 for i in range(_MINHASH_PERMS)],
    dtype=np.uint64,
)
_MH_B = np.array(
    [hashing.crc64(f"mh-b-{i}".encode()) for i in range(_MINHASH_PERMS)],
    dtype=np.uint64,
)


def _minhash_sig(sh: set[str]) -> np.ndarray:
    base = np.array(
        [hashing.crc64(s.encode()) for s in sh], dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        m = (base[:, None] * _MH_A[None, :] + _MH_B[None, :])
    return m.min(axis=0)


def minhash_dedup(
    sf_dir: str, bands: int = 16, threshold: float = 0.8
) -> ray.data.Dataset:
    """MinHash+LSH near-dup: shingle → 64-perm minhash → 16 bands × 4 rows
    → band groupby → verified Jaccard-estimate ≥ threshold within bucket →
    keep lowest doc_id per near-dup pair.  Returns pruned doc_ids with the
    doc that shadowed them."""
    rows_per_band = _MINHASH_PERMS // bands

    def sigs(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "band": [], "band_hash": [], "sig": []}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = _minhash_sig(_shingles(tokenizer.simple_tokens(text or "")))
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = hashing.crc64(chunk.tobytes())
                out["doc_id"].append(doc_id)
                out["band"].append(b)
                out["band_hash"].append(bh & 0x7FFFFFFFFFFFFFFF)
                out["sig"].append(sig.astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "band": pa.array(out["band"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.int64()),
                "sig": pa.array(out["sig"], pa.list_(pa.int64())),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "kept_by": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(idx)
        ids = g["doc_id"].to_numpy()
        sigs_m = np.array(g["sig"].to_pylist(), dtype=np.int64)
        pruned, kept_by = [], []
        for i in range(1, len(ids)):
            sim = (sigs_m[:i] == sigs_m[i]).mean(axis=1)
            j = int(np.argmax(sim))
            if sim[j] >= threshold:
                pruned.append(ids[i])
                kept_by.append(ids[j])
        return pa.table(
            {
                "doc_id": pa.array(pruned, pa.int64()),
                "kept_by": pa.array(kept_by, pa.int64()),
            }
        )

    banded = _docs_text(sf_dir).map_batches(sigs, batch_format="pyarrow")
    pruned = banded.groupby(["band", "band_hash"]).map_groups(
        verify, batch_format="pyarrow"
    )
    # a doc may be pruned via several bands → keep one row (min kept_by)
    return (
        pruned.groupby("doc_id")
        .min("kept_by")
        .map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "kept_by": t["min(kept_by)"]}
            ),
            batch_format="pyarrow",
        )
    )


def simhash_dedup(sf_dir: str) -> ray.data.Dataset:
    """SimHash near-dup over documents (the reference's D3 in LSH form,
    applied to the documents table): doc_id → 32-bit simhash → banded
    prune.  Returns (doc_id, simhash, pruned)."""
    from searchengine_ray.stages import dedup as dedup_stage

    def sims(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            wc = tokenizer.word_count(tokenizer.simple_tokens(text or ""))
            ids.append(doc_id)
            hs.append(hashing.simhash(wc))
        return pa.table(
            {
                "docid": pa.array(ids, pa.int64()),
                "simhash": pa.array(hs, pa.int64()),
            }
        )

    with_sim = _docs_text(sf_dir).map_batches(sims, batch_format="pyarrow")
    pruned_ids = {
        r["docid"] for r in dedup_stage.simhash_prune_lsh(with_sim).take_all()
    }
    ref = ray.put(frozenset(pruned_ids))

    def mark(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        return batch.append_column(
            "pruned", pa.array([d in ids for d in batch["docid"].to_pylist()])
        ).rename_columns(["doc_id", "simhash", "pruned"])

    return with_sim.map_batches(mark, batch_format="pyarrow")


def ngram_jaccard_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs, LSH-candidate-generated:
    MinHash banding proposes candidate pairs, then the TRUE Jaccard over
     3-gram shingle sets is verified inside the group (no all-pairs scan).
    Returns (a, b, jac_pct) with jac_pct an integer percent (SQL-safe)."""

    def sigs(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "band_hash": [], "text": []}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = _minhash_sig(_shingles(tokenizer.simple_tokens(text or ""), n))
            for b in range(8):
                chunk = sig[b * 8 : (b + 1) * 8]
                out["doc_id"].append(doc_id)
                out["band_hash"].append(
                    (b << 56) | (hashing.crc64(chunk.tobytes()) & 0xFFFFFFFFFFFFFF)
                )
                out["text"].append(text)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "band_hash": pa.array(out["band_hash"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        a_, b_, j_ = [], [], []
        if group.num_rows >= 2:
            idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
            g = group.take(idx)
            ids = g["doc_id"].to_pylist()
            sh = [
                _shingles(tokenizer.simple_tokens(t or ""), n)
                for t in g["text"].to_pylist()
            ]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    inter = len(sh[i] & sh[j])
                    union = len(sh[i] | sh[j])
                    jac = inter / union if union else 0.0
                    if jac >= threshold:
                        a_.append(ids[i])
                        b_.append(ids[j])
                        j_.append(int(round(jac * 100)))
        return pa.table(
            {
                "a": pa.array(a_, pa.int64()),
                "b": pa.array(b_, pa.int64()),
                "jac_pct": pa.array(j_, pa.int64()),
            }
        )

    banded = _docs_text(sf_dir).map_batches(sigs, batch_format="pyarrow")
    pairs = banded.groupby("band_hash").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["a", "b"]).max("jac_pct").map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "jac_pct": t["max(jac_pct)"]}
        ),
        batch_format="pyarrow",
    )


# -------------------------------------------------------- similarity search


def knn_cosine(sf_dir: str, k: int = 10, num_queries: int = 5) -> ray.data.Dataset:
    """Brute-force cosine top-k ANN baseline: the query matrix (first
    ``num_queries`` embeddings) is broadcast once via ``ray.put``; each
    batch does one float64 matmul against it; per-query top-k is a final
    small sort.  Scale path: IVF/LSH bucketing (see ``embedding_neardup``).
    Returns (query_id, neighbor_id, rank) — ints only."""
    import pyarrow.parquet as pq

    emb_path = f"{sf_dir}/embeddings.parquet"
    qt = pq.read_table(emb_path).slice(0, num_queries)
    q = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qids = np.array(qt["vec_id"].to_pylist(), dtype=np.int64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put((qids, qn))

    def score(batch: pa.Table) -> pa.Table:
        qids_, qn_ = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy()
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ qn_.T  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids_)):
            out_q.extend([qids_[j]] * len(ids))
            out_n.extend(ids.tolist())
            out_s.extend(sims[:, j].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("sim", "descending"), ("neighbor_id", "ascending")],
        )
        g = group.take(idx[:k])
        return pa.table(
            {
                "query_id": g["query_id"],
                "neighbor_id": g["neighbor_id"],
                "rank": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
            }
        )

    scored = (
        ray.data.read_parquet(emb_path)
        .map_batches(score, batch_format="pyarrow")
    )
    return scored.groupby("query_id").map_groups(topk, batch_format="pyarrow")


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    num_queries: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 3,
) -> ray.data.Dataset:
    """IVF-bucketed approximate nearest neighbour — the scale path beside
    the brute-force baseline (:func:`knn_cosine`).

    Train: seeded centroids from the first vectors, ``lloyd_iters`` rounds
    of (distributed assign via broadcast centroid matrix) → (driver
    centroid update from per-batch partial sums).  Search: score only the
    vectors whose centroid is among each query's ``nprobe`` closest —
    implemented as one vectorized mask per batch, so a batch is read once
    for all queries.  Returns (query_id, neighbor_id, rank); recall vs
    brute force is asserted in tests, not guaranteed 100%.
    """
    import pyarrow.parquet as pq

    emb_path = f"{sf_dir}/embeddings.parquet"
    head = pq.read_table(emb_path)
    all_vecs = np.array(head["embedding"].to_pylist(), dtype=np.float64)
    all_vecs /= np.maximum(np.linalg.norm(all_vecs, axis=1, keepdims=True), 1e-30)
    # at true scale the training sample is a ds.random_sample pull; the
    # Lloyd rounds below already use only distributed passes + driver sums
    rng = np.random.RandomState(11)
    centroids = all_vecs[rng.choice(len(all_vecs), n_centroids, replace=False)]

    def _assign_partial(batch: pa.Table, cent_ref) -> pa.Table:
        cent = ray.get(cent_ref)
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        a = np.argmax(m @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=cent.shape[0])
        return pa.table(
            {
                "cid": pa.array(np.arange(cent.shape[0]), pa.int64()),
                "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "count": pa.array(counts, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(emb_path)
    for _ in range(lloyd_iters):
        cent_ref = ray.put(centroids)
        parts = ds.map_batches(
            lambda b, r=cent_ref: _assign_partial(b, r), batch_format="pyarrow"
        ).take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(n_centroids)
        for r in parts:
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["count"]
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
        )

    qt = head.slice(0, num_queries)
    q = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qids = np.array(qt["vec_id"].to_pylist(), dtype=np.int64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    probe_sets = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    search_ref = ray.put((qids, qn, centroids, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        qids_, qn_, cent, probes = ray.get(search_ref)
        ids = batch["vec_id"].to_numpy()
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(mn @ cent.T, axis=1)
        out_q, out_n, out_s = [], [], []
        sims_all = mn @ qn_.T
        for j in range(len(qids_)):
            mask = np.isin(assign, probes[j])
            out_q.extend([qids_[j]] * int(mask.sum()))
            out_n.extend(ids[mask].tolist())
            out_s.extend(sims_all[mask, j].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("sim", "descending"), ("neighbor_id", "ascending")]
        )
        g = group.take(idx[:k])
        return pa.table(
            {
                "query_id": g["query_id"],
                "neighbor_id": g["neighbor_id"],
                "rank": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.groupby("query_id").map_groups(topk, batch_format="pyarrow")


def embedding_neardup(
    sf_dir: str, threshold: float = 0.98, band_bits: int = 12
) -> ray.data.Dataset:
    """Embedding-cosine near-dup at scale: random-hyperplane LSH buckets
    (sign sketch → ``band_bits``-bit keys × 4 tables), exact cosine verify
    within bucket, keep lowest vec_id.  Returns pruned (vec_id, kept_by)."""
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"][0]
    )
    rng = np.random.RandomState(7)
    planes = rng.randn(4, band_bits, dim)
    p_ref = ray.put(planes)

    def keys(batch: pa.Table) -> pa.Table:
        pl = ray.get(p_ref)
        ids = batch["vec_id"].to_numpy()
        m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        out_id, out_key, out_vec = [], [], []
        for t in range(pl.shape[0]):
            bits = (mn @ pl[t].T) > 0  # (batch, band_bits)
            key = (bits @ (1 << np.arange(band_bits))).astype(np.int64) | (
                t << 60
            )
            out_id.extend(ids.tolist())
            out_key.extend(key.tolist())
            out_vec.extend(mn.tolist())
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "key": pa.array(out_key, pa.int64()),
                "vec": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        pruned, kept = [], []
        if group.num_rows >= 2:
            idx = pc.sort_indices(group, sort_keys=[("vec_id", "ascending")])
            g = group.take(idx)
            ids = g["vec_id"].to_numpy()
            m = np.array(g["vec"].to_pylist(), dtype=np.float64)
            for i in range(1, len(ids)):
                sims = m[:i] @ m[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    pruned.append(ids[i])
                    kept.append(ids[j])
        return pa.table(
            {
                "vec_id": pa.array(pruned, pa.int64()),
                "kept_by": pa.array(kept, pa.int64()),
            }
        )

    banded = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").map_batches(
        keys, batch_format="pyarrow"
    )
    pruned = banded.groupby("key").map_groups(verify, batch_format="pyarrow")
    return pruned.groupby("vec_id").min("kept_by").map_batches(
        lambda t: pa.table(
            {"vec_id": t["vec_id"], "kept_by": t["min(kept_by)"]}
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------ relational / window


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Windowed aggregate: events per (event_type, hour) with distinct
    users — tumbling time window as truncate-then-groupby."""

    def trunc(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": hour,
                "user_id": batch["user_id"],
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id"]
    ).map_batches(trunc, batch_format="pyarrow")

    def agg(group: pa.Table) -> pa.Table:
        users = pc.count_distinct(group["user_id"]).as_py()
        return pa.table(
            {
                "event_type": group["event_type"].slice(0, 1),
                "hour": group["hour"].slice(0, 1),
                "n": pa.array([group.num_rows], pa.int64()),
                "users": pa.array([users], pa.int64()),
            }
        )

    return ds.groupby(["event_type", "hour"]).map_groups(agg, batch_format="pyarrow")


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Gap-based sessionization — the stateful windowed operator Ray Data
    lacks natively, expressed as groupby(user).map_groups with an in-group
    sort (SURVEY.md custom-operator recipe (a)).  A session breaks when the
    gap to the previous event exceeds ``gap_minutes``.  Returns one row per
    session: (user_id, session_id (1-based per user), n_events) — ints only
    so the DuckDB window-function oracle compares exactly.

    Partitioning assumption: one user's events fit one group (true unless a
    single user exceeds block scale; salt by day then merge if so).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(idx)
        ts = g["ts"].cast(pa.int64()).to_numpy()
        breaks = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            breaks[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        sess = np.cumsum(breaks)
        uniq, counts = np.unique(sess, return_counts=True)
        user = g["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([user] * len(uniq), pa.int64()),
                "session_id": pa.array(uniq, pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def lineitem_agg(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped groupby aggregate (counts kept integral for exact
    oracle comparison)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def agg(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": group["l_returnflag"].slice(0, 1),
                "l_linestatus": group["l_linestatus"].slice(0, 1),
                "sum_qty": pa.array(
                    [int(pc.sum(pc.cast(group["l_quantity"], pa.int64())).as_py())],
                    pa.int64(),
                ),
                "count_order": pa.array([group.num_rows], pa.int64()),
            }
        )

    return ds.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        agg, batch_format="pyarrow"
    )


def orders_by_segment(sf_dir: str) -> ray.data.Dataset:
    """Join orders ⨝ customer (broadcast small side) → orders per market
    segment.  The customer table is ``ray.put`` once, looked up per batch —
    no shuffle join for a small-side lookup."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lookup = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())
    )
    ref = ray.put(lookup)

    def seg(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        segs = [lk.get(k) for k in batch["o_custkey"].to_pylist()]
        return pa.table({"c_mktsegment": pa.array(segs, pa.string())})

    ds = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(seg, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .count()
    )
    return ds.map_batches(
        lambda t: pa.table(
            {"c_mktsegment": t["c_mktsegment"], "n_orders": t["count()"]}
        ),
        batch_format="pyarrow",
    )
