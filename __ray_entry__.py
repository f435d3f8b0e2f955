"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full index build → link-graph
scores → reference-scorer top-k) on sf0.001.  ``queries()`` exposes one
callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data operators); ``oracle_sql()`` carries the DuckDB-equivalent
SQL for every SQL-expressible entry.  SQL-checked text operators use the
SQL-parity tokenizer (lower, split on ``[^a-z0-9]+``); the reference
search-engine tokenizer/stemmer path is validated by the pytest
oracle-parity suite instead (tests/test_build_parity.py,
tests/test_linkgraph_query.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

SEARCH_QUERIES = [
    "hash join merge",
    "window aggregate stream",
    "spark query batch",
    "customer order table",
    "the a of",
    "slow scan filter sort",
]

# queries for the SQL-checked reference-scorer entry over the simple index:
# corpus-vocabulary words only, none in the 174-word stopword list (the
# validation heap rule is identity for these — see oracle/simple_sql.py)
SIMPLE_SCORER_QUERIES = [
    "hash join merge",
    "window batch stream",
    "table scan sort",
    "spark stream window batch",
    "fast key order part",
]

# queries for the legacy max-norm scorer (A9): lowercase corpus-vocabulary
# words; two exercise the query.count substring quirk — a zero-df word
# ("partition", "slowest") drops from the term set but still inflates the
# substring count of the surviving prefix term; one repeats a word
LEGACY_SCORER_QUERIES = [
    "hash join merge",
    "part partition sort",
    "stream window stream",
    "slow slowest scan",
    "key value group",
]

_INDEX_CACHE: dict[str, Any] = {}


def _build_full_index(sf_dir: str):
    """Build (or resume) the full search index over pages derived from the
    documents table; returns the BuildResult.  Cached per sf_dir."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    import ray.data

    from searchengine_ray.pipelines import linkgraph
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.sources.pages import pages_dataset_from_documents
    from searchengine_ray.state.checkpoint import StageCheckpoint

    import searchengine_ray

    # version-salted so a /tmp index from an older engine build never leaks
    # into a newer run's results
    tag = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}:{searchengine_ray.__version__}".encode()
    ).hexdigest()[:10]
    out_dir = os.path.join("/tmp", f"se_ray_index_{tag}")
    pages = pages_dataset_from_documents(sf_dir)
    result = build_index(pages, out_dir)
    quality_marker = os.path.join(out_dir, "_quality_done")
    if not os.path.exists(quality_marker):
        docs = ray.data.read_parquet(result.docs_dir)
        edges = ray.data.read_parquet(result.edges_dir)
        updated = linkgraph.compute_quality(
            edges, docs, result.last_docid, method="auto"
        )
        StageCheckpoint(out_dir, "docs").write(updated)
        with open(quality_marker, "w") as f:
            f.write("ok")
    _INDEX_CACHE[sf_dir] = result
    return result


def _build_simple_index(sf_dir: str):
    """Build (or resume) the SQL-parity index variant: the SAME distributed
    pipeline (docid sort, dedup groupbys, posting shuffle, varbyte encode)
    with simple_tokens / no stemming / no near-dup window, over
    ``simple_pages_dataset`` — every output is DuckDB-reproducible, so the
    driver's oracle hash-checks the full build (VERDICT r1 next#1).
    PageRank/HITS run tol=0 (fixed 25 rounds) so the unrolled SQL oracle
    matches without expressing early convergence."""
    key = ("simple", sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    import ray.data

    from searchengine_ray import params
    from searchengine_ray.pipelines import linkgraph
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.sources.pages import simple_pages_dataset
    from searchengine_ray.state.checkpoint import StageCheckpoint

    import searchengine_ray

    tag = hashlib.sha1(
        f"simple:{os.path.abspath(sf_dir)}:{searchengine_ray.__version__}".encode()
    ).hexdigest()[:10]
    out_dir = os.path.join("/tmp", f"se_ray_simple_{tag}")
    cfg = params.BuildConfig(
        tokenizer="simple", near_dup_mode="off", keep_text=False
    )
    result = build_index(simple_pages_dataset(sf_dir), out_dir, cfg)
    quality_marker = os.path.join(out_dir, "_quality_done")
    if not os.path.exists(quality_marker):
        docs = ray.data.read_parquet(result.docs_dir)
        edges = ray.data.read_parquet(result.edges_dir)
        updated = linkgraph.compute_quality(
            edges, docs, result.last_docid, method="auto", pr_tol=0.0, hits_tol=0.0
        )
        StageCheckpoint(out_dir, "docs").write(updated)
        with open(quality_marker, "w") as f:
            f.write("ok")
    _INDEX_CACHE[key] = result
    return result


def _search_topk(sf_dir: str, mode: str):
    import ray.data

    from searchengine_ray.pipelines.query import QueryActor

    result = _build_full_index(sf_dir)
    queries = ray.data.from_items(
        [{"qid": i, "query": q} for i, q in enumerate(SEARCH_QUERIES)]
    )
    k = 5 if mode == "reference" else 10
    return queries.map_batches(
        QueryActor,
        fn_constructor_kwargs={"index_dir": result.out_dir, "k": k, "mode": mode},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 2),
    )


def entry() -> Any:
    """Flagship: build index on sf0.001 pages, score link graph, answer the
    query set with the reference-exact scorer."""
    ds = _search_topk("/root/testdata/sf0.001", "reference")
    return ds.materialize()


# --------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines import ops
    from searchengine_ray.stages import media

    def index_docs(sf_dir: str):
        import ray.data

        r = _build_full_index(sf_dir)
        return ray.data.read_parquet(r.docs_dir).select_columns(
            ["docid", "url", "total_tokens", "doc_len"]
        )

    def index_term_df(sf_dir: str):
        import ray.data

        r = _build_full_index(sf_dir)
        return ray.data.read_parquet(r.segments_dir).select_columns(["term", "df"])

    def index_edges(sf_dir: str):
        import ray.data

        r = _build_full_index(sf_dir)
        return ray.data.read_parquet(r.edges_dir)

    def pagerank_scores(sf_dir: str):
        import ray.data

        r = _build_full_index(sf_dir)
        return ray.data.read_parquet(r.docs_dir).select_columns(
            ["docid", "pr_quality", "hub_quality", "auth_quality"]
        )

    def media_features(sf_dir: str):
        """Multimodal decode+featurize, flattened to a wide (media_id,
        media_type, n_bytes, f0..f15) schema so the md5-family fake
        features are value-hash-comparable against the DuckDB oracle."""
        import numpy as np
        import pyarrow as pa

        def widen(batch: pa.Table) -> pa.Table:
            feat = batch["feature"]
            if isinstance(feat, pa.ChunkedArray):
                feat = feat.combine_chunks()
            mat = np.asarray(feat.flatten()).reshape(-1, media.FEATURE_DIM)
            cols = {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": batch["n_bytes"],
            }
            for i in range(media.FEATURE_DIM):
                cols[f"f{i}"] = pa.array(mat[:, i], pa.float64())
            return pa.table(cols)

        return media.media_features(media.media_from_documents(sf_dir)).map_batches(
            widen, batch_format="pyarrow"
        )

    def media_meta(sf_dir: str):
        """The SQL-expressible slice of the multimodal stage output
        (media_id, media_type, n_bytes) — the float feature vector stays
        rows-only (fake-decode CRC features aren't SQL)."""
        return media.media_features(media.media_from_documents(sf_dir)).select_columns(
            ["media_id", "media_type", "n_bytes"]
        )

    # ----- SQL-parity build variant: the same distributed pipeline,
    # DuckDB-checkable end-to-end (docid sort → dedup → posting shuffle →
    # varbyte encode/decode → linkgraph → BM25 top-k)
    def index_simple_docs(sf_dir: str):
        import ray.data

        r = _build_simple_index(sf_dir)
        return ray.data.read_parquet(r.docs_dir).select_columns(
            ["docid", "url", "total_tokens", "doc_len"]
        )

    def index_simple_postings(sf_dir: str):
        import ray.data

        from searchengine_ray.functions import varbyte

        r = _build_simple_index(sf_dir)

        def decode(batch):
            import pyarrow as pa

            terms, ids, tfs = [], [], []
            for row in batch.to_pylist():
                d, t = varbyte.decode_postings(row["docids_vb"], row["tfs_vb"])
                terms.extend([row["term"]] * len(d))
                ids.extend(d.tolist())
                tfs.extend(t.tolist())
            return pa.table(
                {
                    "term": pa.array(terms, pa.string()),
                    "docid": pa.array(ids, pa.int64()),
                    "tf": pa.array(tfs, pa.int64()),
                }
            )

        return ray.data.read_parquet(r.segments_dir).map_batches(
            decode, batch_format="pyarrow"
        )

    def index_simple_term_df(sf_dir: str):
        import ray.data

        r = _build_simple_index(sf_dir)
        return ray.data.read_parquet(r.segments_dir).select_columns(["term", "df"])

    def index_simple_edges(sf_dir: str):
        import ray.data

        r = _build_simple_index(sf_dir)
        return ray.data.read_parquet(r.edges_dir)

    def _simple_quality(sf_dir: str, cols: dict):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        r = _build_simple_index(sf_dir)

        def conv(batch: pa.Table) -> pa.Table:
            out = {"docid": batch["docid"]}
            for out_name, src in cols.items():
                f64 = pc.cast(pc.cast(batch[src], pa.float32()), pa.float64())
                out[out_name] = pc.cast(
                    pc.round(pc.multiply(f64, pa.scalar(1e9))), pa.int64()
                )
            return pa.table(out)

        return ray.data.read_parquet(r.docs_dir).map_batches(
            conv, batch_format="pyarrow"
        )

    def index_simple_pagerank(sf_dir: str):
        return _simple_quality(sf_dir, {"pr_e9": "pr_quality"})

    def index_simple_hits(sf_dir: str):
        return _simple_quality(
            sf_dir, {"hub_e9": "hub_quality", "auth_e9": "auth_quality"}
        )

    def _search_simple(sf_dir: str, mode: str, qs: list[str], k: int):
        import pyarrow as pa
        import ray.data

        from searchengine_ray.pipelines.query import QueryActor

        r = _build_simple_index(sf_dir)
        queries = ray.data.from_items(
            [{"qid": i, "query": q} for i, q in enumerate(qs)]
        )
        out = queries.map_batches(
            QueryActor,
            fn_constructor_kwargs={"index_dir": r.out_dir, "k": k, "mode": mode},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        return out.map_batches(
            lambda t: pa.table(
                {
                    "qid": t["qid"].cast(pa.int64()),
                    "docid": t["docid"],
                    "rank": t["rank"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def search_simple_bm25(sf_dir: str):
        return _search_simple(sf_dir, "bm25", SEARCH_QUERIES, 10)

    def _search_simple_quantized(sf_dir: str, mode: str, qs: list[str], k: int):
        """Scorer over the simple index, ranked on the 1e-9-quantized net
        score (both sides — see oracle/simple_sql): candidate-normalized
        near-ties are otherwise decided by f64 summation order."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from searchengine_ray.pipelines.query import QueryActor

        r = _build_simple_index(sf_dir)
        queries = ray.data.from_items(
            [{"qid": i, "query": q} for i, q in enumerate(qs)]
        )
        scored = queries.map_batches(
            QueryActor,
            fn_constructor_kwargs={
                "index_dir": r.out_dir,
                "k": None,  # score ALL candidates; top-k after quantization
                "mode": mode,
            },
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )

        def topk(group: pa.Table) -> pa.Table:
            q9 = pc.round(group["score"], ndigits=9)
            idx = pc.sort_indices(
                pa.table({"s": q9, "d": group["docid"]}),
                sort_keys=[("s", "descending"), ("d", "ascending")],
            )
            g = group.take(idx[:k])
            return pa.table(
                {
                    "qid": g["qid"].cast(pa.int64()),
                    "docid": g["docid"],
                    "rank": pa.array(range(1, g.num_rows + 1), pa.int64()),
                }
            )

        return scored.groupby("qid").map_groups(topk, batch_format="pyarrow")

    def search_simple_reference(sf_dir: str):
        return _search_simple_quantized(
            sf_dir, "reference", SIMPLE_SCORER_QUERIES, 5
        )

    def search_simple_legacy(sf_dir: str):
        """The legacy max-norm scorer (SURVEY §2 A9,
        ``lib/process_query.py:154-201``) over the simple index — full-df
        idf, substring-count query tf, pr/hub/auth max-normalization over
        the intersection candidates (oracle:
        simple_sql.legacy_scorer_sql)."""
        return _search_simple_quantized(
            sf_dir, "legacy", LEGACY_SCORER_QUERIES, 5
        )

    def summaries_docs(sf_dir: str):
        """The summarizer actor-pool stage over the documents table
        directly (docid = doc_id) — the deterministic input transform
        (whitespace-collapse → 512-char clip → 60-word cap) is
        SQL-expressible, so the stage is oracle-checked; the flagship
        ``summaries`` entry (htmlx-extracted texts) stays rows-only."""
        import pyarrow as pa
        import ray.data

        from searchengine_ray.stages.summarize import build_summaries

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(
            lambda t: pa.table({"docid": t["doc_id"], "text": t["text"]}),
            batch_format="pyarrow",
        )
        return build_summaries(docs)

    def summaries(sf_dir: str):
        import ray.data

        from searchengine_ray.stages.summarize import build_summaries

        r = _build_full_index(sf_dir)
        texts = ray.data.read_parquet(r.texts_dir)
        return build_summaries(texts)

    return {
        # --- search-engine pipelines (SURVEY.md §2; oracle = pytest parity)
        "index_docs": index_docs,
        "index_term_df": index_term_df,
        "index_edges": index_edges,
        "pagerank_scores": pagerank_scores,
        "search_topk": lambda sf: _search_topk(sf, "reference"),
        "search_bm25_topk": lambda sf: _search_topk(sf, "bm25"),
        # --- SQL-parity build variant (full pipeline, DuckDB-oracle-checked)
        "index_simple_docs": index_simple_docs,
        "index_simple_postings": index_simple_postings,
        "index_simple_term_df": index_simple_term_df,
        "index_simple_edges": index_simple_edges,
        "index_simple_pagerank": index_simple_pagerank,
        "index_simple_hits": index_simple_hits,
        "search_simple_bm25": search_simple_bm25,
        "search_simple_reference": search_simple_reference,
        "search_simple_legacy": search_simple_legacy,
        # --- SQL-checked text/relational operators
        "term_df": ops.term_df,
        "postings": ops.postings_simple,
        "top_terms": ops.top_terms,
        "doc_stats": ops.doc_stats,
        "language_id": ops.language_id,
        "exact_dedup": ops.exact_dedup,
        "events_hourly": ops.events_hourly,
        "events_sessionize": ops.events_sessionize,
        "lineitem_agg": ops.lineitem_agg,
        "orders_by_segment": ops.orders_by_segment,
        "knn_cosine": ops.knn_cosine,
        # --- dedup / similarity (deterministic, rows-only oracle)
        "minhash_dedup": ops.minhash_dedup,
        "clean_corpus": ops.clean_corpus,
        "simhash_dedup": ops.simhash_dedup,
        "ngram_jaccard": ops.ngram_jaccard_pairs,
        "embedding_neardup": ops.embedding_neardup,
        "knn_ivf": ops.knn_ivf,
        "fingerprint": ops.fingerprint,
        "token_count_bpe": ops.token_count_bpe,
        "quality_score": ops.quality_score,
        "repetition_stats": ops.repetition_stats,
        "language_id_trigram": ops.language_id_trigram,
        "media_features": media_features,
        "media_meta": media_meta,
        "summaries_docs": summaries_docs,
        "summaries": summaries,
    }


# ------------------------------------------------------------- oracle SQL

_TOKS = (
    "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9]+'), x -> x <> '')) AS term FROM documents"
)


def _stop_list() -> str:
    from searchengine_ray.pipelines.ops import SQL_STOPWORDS

    return ", ".join(f"'{w}'" for w in SQL_STOPWORDS)


def _trigram_profile_values() -> str:
    """The char-trigram language profiles as SQL VALUES rows (lang,
    priority, gram) — shared verbatim with ops._LANG_TRIGRAMS so the
    DuckDB oracle scores the exact same tables."""
    from searchengine_ray.pipelines.ops import _LANG_TRIGRAMS

    rows = []
    for pri, (lang, grams) in enumerate(_LANG_TRIGRAMS.items()):
        for g in grams:
            rows.append(f"('{lang}', {pri}, '{g}')")
    return ", ".join(rows)


def _knn_ivf_sql(
    k: int = 10,
    num_queries: int = 5,
    n_centroids: int = 16,
    nprobe: int = 8,
    lloyd_iters: int = 3,
) -> str:
    """Full replay of ``ops.knn_ivf`` in DuckDB: stride-seeded centroids,
    ``lloyd_iters`` rounds of (argmax-cosine assign → per-dim mean →
    re-normalize), probe-set selection and IVF-restricted scoring — every
    step is the same arithmetic the Ray pipeline runs (vectors cast
    float32→double, normalized, dot products on normalized vectors), so
    the integer output (query_id, neighbor_id, rank) matches exactly.

    Exact on the full-sample path (≤ ``max(n_centroids*64, 1024)`` vectors
    — both driver scales): above that the Ray side seeds from a
    ``random_sample`` pull the SQL can't replay.  Float note: summation
    ORDER differs (numpy pairwise/BLAS vs sequential), so sims can differ
    in the last ulp — rank flips would need two distinct vectors within
    ~1e-14 cosine, and exact duplicates tie-break on neighbor_id in both
    engines."""
    target = max(n_centroids * 64, 1024)  # ops.knn_ivf's sample bound
    norm = (
        "(SELECT cid, list_transform(w, x -> x / nn) AS c FROM ("
        "SELECT cid, w, GREATEST(sqrt(list_sum(list_transform(w, y -> y*y)))"
        ", 1e-30) AS nn FROM ({src})))"
    )
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        # normalized vectors (numpy: v / max(||v||, 1e-30))
        "en AS (SELECT vec_id, list_transform(v, x -> x / nn) AS v FROM ("
        "SELECT vec_id, v, GREATEST(sqrt(list_sum(list_transform(v, "
        "y -> y*y))), 1e-30) AS nn FROM e)), "
        "nt AS (SELECT count(*) AS n FROM en), "
        # bounded train sample: every ceil(n/target)-th vec_id — the exact
        # deterministic stride ops.knn_ivf samples with, so the oracle
        # replays the seeding at EVERY scale (not just the full-sample one)
        f"sst AS (SELECT GREATEST(CAST(CEIL(CAST(n AS DOUBLE) / {target}) "
        "AS BIGINT), 1) AS s FROM nt), "
        "sed AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn, v "
        "FROM en WHERE vec_id % (SELECT s FROM sst) = 0), "
        "sn AS (SELECT count(*) AS n FROM sed), "
        # stride seeding over the vec_id-sorted sample == sample[::stride][:C]
        f"c0 AS (SELECT row_number() OVER (ORDER BY rn) - 1 AS cid, v AS c "
        f"FROM sed WHERE rn % GREATEST((SELECT n FROM sn) // {n_centroids}, 1) = 0 "
        f"ORDER BY rn LIMIT {n_centroids})",
    ]
    prev = "c0"
    for r in range(1, lloyd_iters + 1):
        parts.append(
            # argmax-cosine assignment (ties → lowest cid, numpy argmax)
            f"a{r} AS (SELECT vec_id, v, cid FROM ("
            f"SELECT en.vec_id, en.v, {prev}.cid, row_number() OVER ("
            f"PARTITION BY en.vec_id ORDER BY list_dot_product(en.v, "
            f"{prev}.c) DESC, {prev}.cid ASC) AS rnk "
            f"FROM en CROSS JOIN {prev}) WHERE rnk = 1)"
        )
        parts.append(
            # per-dimension mean of the assigned normalized vectors
            f"u{r} AS (SELECT cid, list(sv ORDER BY i) AS m FROM ("
            f"SELECT cid, i, sum(x) / count(x) AS sv FROM ("
            f"SELECT a{r}.cid, u.i, a{r}.v[CAST(u.i AS INT)] AS x "
            f"FROM a{r}, UNNEST(generate_series(1, len(a{r}.v))) u(i)) "
            f"GROUP BY cid, i) GROUP BY cid)"
        )
        # empty clusters keep the previous centroid; ALL centroids are then
        # re-normalized (numpy normalizes the full matrix each round)
        src = (
            f"SELECT {prev}.cid, COALESCE(u{r}.m, {prev}.c) AS w "
            f"FROM {prev} LEFT JOIN u{r} USING (cid)"
        )
        parts.append(f"c{r} AS {norm.format(src=src)}")
        prev = f"c{r}"
    parts.append(
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM en "
        f"ORDER BY vec_id LIMIT {num_queries})"
    )
    parts.append(
        f"pr AS (SELECT query_id, cid FROM ("
        f"SELECT q.query_id, {prev}.cid, row_number() OVER ("
        f"PARTITION BY q.query_id ORDER BY list_dot_product(q.qv, {prev}.c) "
        f"DESC, {prev}.cid ASC) AS rnk FROM q CROSS JOIN {prev}) "
        f"WHERE rnk <= {nprobe})"
    )
    parts.append(
        f"a4 AS (SELECT vec_id, v, cid FROM ("
        f"SELECT en.vec_id, en.v, {prev}.cid, row_number() OVER ("
        f"PARTITION BY en.vec_id ORDER BY list_dot_product(en.v, {prev}.c) "
        f"DESC, {prev}.cid ASC) AS rnk FROM en CROSS JOIN {prev}) "
        f"WHERE rnk = 1)"
    )
    parts.append(
        "s AS (SELECT pr.query_id, a4.vec_id AS neighbor_id, "
        "list_dot_product(a4.v, q.qv) AS sim "
        "FROM pr JOIN q USING (query_id) JOIN a4 ON a4.cid = pr.cid)"
    )
    return (
        ", ".join(parts)
        + f" SELECT query_id, neighbor_id, rank FROM ("
        f"SELECT query_id, neighbor_id, row_number() OVER ("
        f"PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank "
        f"FROM s) WHERE rank <= {k}"
    )


def _minhash_perm_values() -> str:
    """The 64 MinHash permutation constants as SQL VALUES rows (i, a, b) —
    shared verbatim with ops._MH_A/_MH_B (63-bit, so HUGEINT h*a+b never
    overflows) so the DuckDB oracle replays the exact signatures."""
    from searchengine_ray.pipelines.ops import _MH_A, _MH_B

    return ", ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )


def _minhash_cte(src: str) -> str:
    """CTE chain replaying ops.minhash_prune over relation ``src(doc_id,
    text)``: same tokenizer → distinct 3-gram shingles ({''} for <3-token
    docs) → md5-64 base hash → 64 affine permutations (mod 2^64,
    HUGEINT-safe 63-bit constants) → per-perm min = signature → all-pairs
    equal-perm count in ``eq(a, b, neq)``.  No banding needed: ≥52 equal
    of 64 perms leaves ≤12 unequal perms over 16 bands, so ≥4 bands
    collide — LSH recall for verified pairs is exactly 1 (pigeonhole),
    making the banded Ray pipeline == all-pairs."""
    return (
        "toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(COALESCE(text,'')), '[^a-z0-9]+'), x -> x <> '') AS ts "
        f"FROM {src}), "
        "sh AS (SELECT DISTINCT doc_id, ts[CAST(i AS INT)] || ' ' || "
        "ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2] AS s "
        "FROM toks, UNNEST(generate_series(1, len(ts) - 2)) u(i) "
        "WHERE len(ts) >= 3 "
        "UNION SELECT doc_id, '' AS s FROM toks WHERE len(ts) < 3), "
        "base AS (SELECT doc_id, "
        "CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) AS h FROM sh), "
        f"perm(i, a, b) AS (VALUES {_minhash_perm_values()}), "
        "sig AS (SELECT doc_id, i, min(CAST((CAST(h AS HUGEINT) * a + b) "
        "% 18446744073709551616 AS UBIGINT)) AS v "
        "FROM base CROSS JOIN perm GROUP BY doc_id, i), "
        "eq AS (SELECT x.doc_id AS a, y.doc_id AS b, "
        "count(*) FILTER (WHERE x.v = y.v) AS neq "
        "FROM sig x JOIN sig y ON x.i = y.i AND x.doc_id < y.doc_id "
        "GROUP BY 1, 2)"
    )


def _quality_q_cte() -> str:
    """CTE chain computing ``q(doc_id, keep)`` — the ops._quality_counts
    keep flag (shared RE2 char classes, integer arithmetic only)."""
    stops = _stop_list()
    return (
        "qc AS (SELECT doc_id, "
        "CAST(length(COALESCE(text,'')) AS BIGINT) AS n_chars, "
        "CAST(length(regexp_replace(COALESCE(text,''), '[^A-Za-z]', '', 'g')) "
        "AS BIGINT) AS n_alpha, "
        "CAST(length(COALESCE(text,'')) - length(regexp_replace("
        "COALESCE(text,''), '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct "
        "FROM documents), "
        "qt AS (SELECT doc_id, count(*) AS n_tokens, "
        f"CAST(sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_stop FROM ({_TOKS}) GROUP BY doc_id), "
        "q AS (SELECT c.doc_id, "
        "(COALESCE(t.n_tokens, 0) BETWEEN 10 AND 100000 "
        "AND c.n_alpha >= 3 * COALESCE(t.n_tokens, 0) "
        "AND c.n_alpha <= 12 * COALESCE(t.n_tokens, 0) "
        "AND COALESCE(t.n_stop, 0) >= 2 "
        "AND 5 * c.n_punct <= c.n_chars) AS keep "
        "FROM qc c LEFT JOIN qt t ON c.doc_id = t.doc_id)"
    )


def _media_features_sql() -> str:
    """Bit-exact replay of the md5-family fake decode
    (``media.DecodeMedia._decode_fake``): 64-bit payload hash from md5 of
    the utf-8 text (the payload IS the utf-8 text bytes), per-dimension
    seed mix mod 2^64 (HUGEINT-safe), >>11, low 32 bits, exact /2^32 —
    one DOUBLE column per dimension, same seed constants as the Ray
    actors."""
    from searchengine_ray.stages.media import FEATURE_DIM, DecodeMedia

    seeds = DecodeMedia(fake=True)._seeds
    gold = 0x9E3779B97F4A7C15
    m64 = 1 << 64
    fcols = ", ".join(
        "CAST((CAST((CAST(h AS HUGEINT) * {s} + {g}) % {m} AS UBIGINT) "
        ">> 11) % 4294967296 AS DOUBLE) / 4294967296.0 AS f{i}".format(
            s=int(seeds[i]), g=gold, m=m64, i=i
        )
        for i in range(FEATURE_DIM)
    )
    return (
        "WITH m AS (SELECT doc_id AS media_id, "
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
        "ELSE 'video' END AS media_type, "
        "CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes, "
        "CAST(concat('0x', substr(md5(COALESCE(text, '')), 1, 16)) AS UBIGINT) "
        "AS h FROM documents) "
        f"SELECT media_id, media_type, n_bytes, {fcols} FROM m"
    )


def oracle_sql() -> dict[str, str]:
    from searchengine_ray.oracle import simple_sql
    from searchengine_ray.pipelines.ops import minhash_min_equal

    stops = _stop_list()
    return {
        "index_simple_docs": simple_sql.docs_sql(),
        "index_simple_postings": simple_sql.postings_sql(),
        "index_simple_term_df": simple_sql.term_df_sql(),
        "index_simple_edges": simple_sql.edges_sql(),
        "index_simple_pagerank": simple_sql.pagerank_sql(),
        "index_simple_hits": simple_sql.hits_sql(),
        "search_simple_bm25": simple_sql.bm25_sql(SEARCH_QUERIES, k=10),
        "search_simple_reference": simple_sql.reference_scorer_sql(
            SIMPLE_SCORER_QUERIES, k=5
        ),
        "search_simple_legacy": simple_sql.legacy_scorer_sql(
            LEGACY_SCORER_QUERIES, k=5
        ),
        "term_df": (
            f"SELECT term, count(DISTINCT doc_id) AS df FROM ({_TOKS}) GROUP BY term"
        ),
        "postings": (
            f"SELECT term, doc_id, count(*) AS tf FROM ({_TOKS}) GROUP BY term, doc_id"
        ),
        "top_terms": (
            f"SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf FROM "
            f"(SELECT term, doc_id, count(*) AS tf FROM ({_TOKS}) GROUP BY term, doc_id) "
            f"GROUP BY term ORDER BY total_tf DESC, term ASC LIMIT 100"
        ),
        "doc_stats": (
            "SELECT d.doc_id, COALESCE(t.n_tokens, 0) AS n_tokens, "
            "COALESCE(t.n_unique, 0) AS n_unique, COALESCE(t.n_stop, 0) AS n_stop "
            "FROM documents d LEFT JOIN ("
            f"SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_unique, "
            f"CAST(sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop "
            f"FROM ({_TOKS}) GROUP BY doc_id) t ON d.doc_id = t.doc_id"
        ),
        "language_id": (
            "SELECT d.doc_id, CASE WHEN COALESCE(t.n_tokens,0) > 0 AND "
            "COALESCE(t.n_stop,0) * 20 >= t.n_tokens THEN 'en' ELSE 'other' END "
            "AS pred_lang FROM documents d LEFT JOIN ("
            f"SELECT doc_id, count(*) AS n_tokens, "
            f"CAST(sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop "
            f"FROM ({_TOKS}) GROUP BY doc_id) t ON d.doc_id = t.doc_id"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS keep_id, count(*) AS n_dups "
            "FROM documents GROUP BY text"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n, "
            "count(DISTINCT user_id) AS users FROM events GROUP BY 1, 2"
        ),
        "events_sessionize": (
            "WITH ordered AS (SELECT user_id, ts, event_id, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
            "FROM events), flagged AS (SELECT user_id, "
            "CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS brk, ts, event_id FROM ordered), "
            "sess AS (SELECT user_id, CAST(sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id "
            "FROM flagged) "
            "SELECT user_id, session_id, count(*) AS n_events FROM sess "
            "GROUP BY user_id, session_id"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_segment": (
            "SELECT c_mktsegment, count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "ngram_jaccard": (
            "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
            "lower(COALESCE(text,'')), '[^a-z0-9]+'), x -> x <> '') AS ts "
            "FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, ts[CAST(i AS INT)] || ' ' || "
            "ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2] AS s "
            "FROM toks, UNNEST(generate_series(1, len(ts) - 2)) u(i) "
            "WHERE len(ts) >= 3), "
            "sz AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id), "
            "pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter "
            "FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id "
            "GROUP BY 1, 2) "
            "SELECT a, b, CAST(inter AS BIGINT) AS inter, "
            "CAST(sa.m + sb.m - inter AS BIGINT) AS uni "
            "FROM pairs JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b "
            "WHERE inter * 100 >= 50 * (sa.m + sb.m - inter)"
        ),
        "minhash_dedup": (
            # exact replay of ops.minhash_dedup (see _minhash_cte)
            f"WITH {_minhash_cte('documents')} "
            "SELECT b AS doc_id, CAST(min(a) AS BIGINT) AS kept_by FROM eq "
            f"WHERE neq >= {minhash_min_equal(0.8)} GROUP BY b"
        ),
        "clean_corpus": (
            # replay of ops.clean_corpus: quality gate → exact dedup among
            # keep-docs → minhash prune among exact survivors; one status
            # row per input doc, stages applied in priority order
            f"WITH {_quality_q_cte()}, "
            "keepers AS (SELECT d.doc_id, COALESCE(d.text,'') AS text "
            "FROM documents d JOIN q ON d.doc_id = q.doc_id WHERE q.keep), "
            "w AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS wi "
            "FROM keepers), "
            "exact_dup AS (SELECT doc_id FROM w WHERE doc_id <> wi), "
            "surv AS (SELECT k.doc_id, k.text FROM keepers k "
            "JOIN w ON k.doc_id = w.doc_id WHERE w.doc_id = w.wi), "
            f"{_minhash_cte('surv')}, "
            "nd AS (SELECT b AS doc_id FROM eq "
            f"WHERE neq >= {minhash_min_equal(0.8)} GROUP BY b) "
            "SELECT d.doc_id, CASE WHEN NOT q.keep THEN 'low_quality' "
            "WHEN e.doc_id IS NOT NULL THEN 'exact_dup' "
            "WHEN n.doc_id IS NOT NULL THEN 'near_dup' "
            "ELSE 'kept' END AS status "
            "FROM documents d "
            "LEFT JOIN q ON d.doc_id = q.doc_id "
            "LEFT JOIN exact_dup e ON d.doc_id = e.doc_id "
            "LEFT JOIN nd n ON d.doc_id = n.doc_id"
        ),
        "simhash_dedup": (
            # bit-exact replay of ops.simhash_dedup: md5-low32 word hash
            # (hash family chosen BECAUSE DuckDB can compute it), signed
            # per-bit count sums (> 0 sets the bit), then the exact global
            # Hamming-ball prune: pruned iff ANY lower doc_id is within
            # Hamming <= 3 (equality with the banded Ray path is pinned in
            # test_scale_paths; here it is replayed as all-pairs EXISTS)
            "WITH tok AS (SELECT doc_id, term, count(*) AS cnt "
            f"FROM ({_TOKS}) GROUP BY doc_id, term), "
            "wh AS (SELECT doc_id, cnt, "
            "CAST(concat('0x', substr(md5(term), 1, 8)) AS UINTEGER) AS h "
            "FROM tok), "
            "bitv AS (SELECT doc_id, i, "
            "sum(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN cnt ELSE -cnt "
            "END) AS v FROM wh, UNNEST(generate_series(0, 31)) u(i) "
            "GROUP BY doc_id, i), "
            "sims0 AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN "
            "(CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) "
            "AS simhash FROM bitv GROUP BY doc_id), "
            "sims AS (SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash "
            "FROM documents d LEFT JOIN sims0 s ON d.doc_id = s.doc_id) "
            "SELECT s.doc_id, s.simhash, "
            "EXISTS(SELECT 1 FROM sims t WHERE t.doc_id < s.doc_id AND "
            "bit_count(xor(t.simhash, s.simhash)) <= 3) AS pruned "
            "FROM sims s"
        ),
        "embedding_neardup": (
            # exact all-pairs oracle over the SAME planted input the Ray
            # pipeline builds (ops.embedding_neardup plant_mod=5): every
            # vec_id % 5 == 0 gains a colinear copy at vec_id + 1e6 scaled
            # by 1 + (vec_id % 7 + 1)/4; cosine is scale-invariant so the
            # planted pairs sit at ~1.0 vs the 0.98 threshold while the max
            # natural pair is ~0.6 — no boundary sensitivity either side
            "WITH aug AS ("
            "SELECT vec_id, embedding FROM embeddings "
            "UNION ALL "
            "SELECT vec_id + 1000000 AS vec_id, "
            "list_transform(embedding, x -> x * s) AS embedding FROM ("
            "SELECT vec_id, embedding, 1.0 + (vec_id % 7 + 1) * 0.25 AS s "
            "FROM embeddings WHERE vec_id % 5 = 0)) "
            "SELECT p.b AS vec_id, CAST(min(p.a) AS BIGINT) AS kept_by FROM ("
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "list_cosine_similarity(a.embedding, b.embedding) AS sim "
            "FROM aug a JOIN aug b ON a.vec_id < b.vec_id) p "
            "WHERE p.sim >= 0.98 GROUP BY p.b"
        ),
        "summaries_docs": (
            "SELECT doc_id AS docid, array_to_string(list_slice(list_filter("
            "regexp_split_to_array(substr(array_to_string(list_filter("
            "regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> x <> ''), "
            "' '), 1, 512), '\\s+'), x -> x <> ''), 1, 60), ' ') AS summary "
            "FROM documents"
        ),
        "media_meta": (
            "SELECT doc_id AS media_id, CASE doc_id % 3 WHEN 0 THEN 'image' "
            "WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, "
            "CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes "
            "FROM documents"
        ),
        "media_features": _media_features_sql(),
        "fingerprint": (
            "WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array("
            "lower(COALESCE(text,'')), '[^a-z0-9]+'), x -> x <> '') AS ts "
            "FROM documents), "
            "sh AS (SELECT doc_id, i, CAST(concat('0x', substr(md5("
            "array_to_string(ts[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 15)) "
            "AS BIGINT) AS h FROM t, UNNEST(generate_series(1, len(ts) - 7)) u(i)), "
            "win AS (SELECT doc_id, i, min(h) OVER (PARTITION BY doc_id ORDER BY i "
            "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh, "
            "count(*) OVER (PARTITION BY doc_id) AS nh FROM sh), "
            "sel AS (SELECT DISTINCT doc_id, mh FROM win WHERE i <= nh - 3), "
            "agg AS (SELECT doc_id, count(*) AS n_fp, min(mh) AS min_fp, "
            "max(mh) AS max_fp FROM sel GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(a.n_fp, 1) AS n_fp, "
            "COALESCE(a.min_fp, 0) AS min_fp, COALESCE(a.max_fp, 0) AS max_fp "
            "FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "token_count_bpe": (
            "SELECT doc_id, "
            "CAST(length(regexp_extract_all(COALESCE(text,''), '\\S+')) AS BIGINT) "
            "AS n_ws_tokens, "
            "CAST(length(regexp_extract_all(COALESCE(text,''), "
            "'[A-Za-z]+|[0-9]{1,3}|[^\\sA-Za-z0-9]+')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "quality_score": (
            # Shares RE2 char classes verbatim with ops.quality_score; the
            # keep flag is integer arithmetic only, so the match is exact.
            "WITH chars AS (SELECT doc_id, "
            "CAST(length(COALESCE(text,'')) AS BIGINT) AS n_chars, "
            "CAST(length(regexp_replace(COALESCE(text,''), '[^A-Za-z]', '', 'g')) "
            "AS BIGINT) AS n_alpha, "
            "CAST(length(regexp_replace(COALESCE(text,''), '[^0-9]', '', 'g')) "
            "AS BIGINT) AS n_digit, "
            "CAST(length(COALESCE(text,'')) - length(regexp_replace("
            "COALESCE(text,''), '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct "
            "FROM documents), "
            "toks AS (SELECT doc_id, count(*) AS n_tokens, "
            f"CAST(sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_stop FROM ({_TOKS}) GROUP BY doc_id) "
            "SELECT c.doc_id, c.n_chars, c.n_alpha, c.n_digit, c.n_punct, "
            "COALESCE(t.n_tokens, 0) AS n_tokens, COALESCE(t.n_stop, 0) AS n_stop, "
            "(COALESCE(t.n_tokens, 0) BETWEEN 10 AND 100000 "
            "AND c.n_alpha >= 3 * COALESCE(t.n_tokens, 0) "
            "AND c.n_alpha <= 12 * COALESCE(t.n_tokens, 0) "
            "AND COALESCE(t.n_stop, 0) >= 2 "
            "AND 5 * c.n_punct <= c.n_chars) AS keep "
            "FROM chars c LEFT JOIN toks t ON c.doc_id = t.doc_id"
        ),
        "repetition_stats": (
            # Gopher-style repetition filters; all counts are ints so the
            # keep_rep flag (integer comparisons only) matches exactly.
            "WITH l AS (SELECT doc_id, unnest(string_split(COALESCE(text,''), "
            "chr(10))) AS line FROM documents), "
            "lagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(count(*) - count(DISTINCT line) AS BIGINT) AS n_dup_lines, "
            "CAST(sum(length(line)) AS BIGINT) AS n_line_chars FROM l "
            "GROUP BY doc_id), "
            "ldist AS (SELECT doc_id, CAST(sum(length(line)) AS BIGINT) AS "
            "distinct_chars FROM (SELECT DISTINCT doc_id, line FROM l) "
            "GROUP BY doc_id), "
            "t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower("
            "COALESCE(text,'')), '[^a-z0-9]+'), x -> x <> '') AS ts "
            "FROM documents), "
            "bg AS (SELECT doc_id, ts[CAST(i AS INT)] || ' ' || "
            "ts[CAST(i + 1 AS INT)] AS bigram FROM t, "
            "UNNEST(generate_series(1, len(ts) - 1)) u(i)), "
            "bagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams, "
            "CAST(max(c) AS BIGINT) AS max_2gram_count FROM ("
            "SELECT doc_id, bigram, count(*) AS c FROM bg "
            "GROUP BY doc_id, bigram) GROUP BY doc_id) "
            "SELECT d.doc_id, la.n_lines, la.n_dup_lines, la.n_line_chars, "
            "CAST(la.n_line_chars - ld.distinct_chars AS BIGINT) AS "
            "dup_line_chars, COALESCE(ba.n_2grams, 0) AS n_2grams, "
            "COALESCE(ba.max_2gram_count, 0) AS max_2gram_count, "
            "(10 * la.n_dup_lines <= 3 * la.n_lines "
            "AND 5 * (la.n_line_chars - ld.distinct_chars) <= la.n_line_chars "
            "AND (COALESCE(ba.n_2grams, 0) < 20 "
            "OR 5 * COALESCE(ba.max_2gram_count, 0) <= "
            "COALESCE(ba.n_2grams, 0))) AS keep_rep "
            "FROM documents d JOIN lagg la USING (doc_id) "
            "JOIN ldist ld USING (doc_id) LEFT JOIN bagg ba USING (doc_id)"
        ),
        "language_id_trigram": (
            "WITH t AS (SELECT doc_id, ' ' || lower(COALESCE(text,'')) || ' ' AS s "
            "FROM documents), "
            "g AS (SELECT doc_id, substring(s, CAST(i AS INT), 3) AS gram "
            "FROM t, UNNEST(generate_series(1, length(s) - 2)) u(i)), "
            f"prof(lang, pri, gram) AS (VALUES {_trigram_profile_values()}), "
            "hits AS (SELECT g.doc_id, p.lang, p.pri, count(*) AS h "
            "FROM g JOIN prof p ON g.gram = p.gram GROUP BY 1, 2, 3), "
            "best AS (SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY h DESC, pri ASC) AS rn FROM hits) "
            "SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang "
            "FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1"
        ),
        "knn_cosine": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])) AS sim FROM embeddings e CROSS JOIN q) "
            "SELECT query_id, neighbor_id, rank FROM ("
            "SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM s) "
            "WHERE rank <= 10"
        ),
        "knn_ivf": _knn_ivf_sql(),
    }
