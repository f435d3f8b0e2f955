"""PageRank/HITS parity (local + dataset modes) and query rank-identity
vs the serial oracle (SURVEY.md §7 steps 6-7)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from searchengine_ray.oracle import serial
from searchengine_ray.pipelines import linkgraph
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.query import QueryEngine
from searchengine_ray.sources.pages import synthesize_pages
from searchengine_ray.state.checkpoint import StageCheckpoint

N_PAGES = 320

# queries over the fixture vocabulary + reference query shapes (TEST.txt
# cases mapped onto the synthetic corpus, FIXTURES.md §2)
QUERIES = [
    "search engine ranking",
    "pagerank hits authority",
    "python is a dynamically typed language",
    'print("Hello world!")',
    "to be or not to be that is the question",
    "big O notation",
    "quantum computing",
    "zzzzz nonexistent term",
    "the of and",           # all stopwords
    "hub page",
    "candy store china",
    "varbyte delta encode",
    "lecture notes course",
    "émigré café",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    table = synthesize_pages(N_PAGES)
    out = str(tmp_path_factory.mktemp("index_q"))
    result = build_index(ray.data.from_arrow(table).repartition(8), out)
    oracle = serial.build(table)
    serial.apply_quality(oracle)
    return table, result, oracle


def _update_docs_with_quality(result, method):
    docs = ray.data.read_parquet(result.docs_dir)
    edges = ray.data.read_parquet(result.edges_dir)
    updated = linkgraph.compute_quality(edges, docs, result.last_docid, method=method)
    ck = StageCheckpoint(result.out_dir, "docs")
    return ck.write(updated)


def test_pagerank_parity_local(built):
    _, result, oracle = built
    edges = ray.data.read_parquet(result.edges_dir)
    src, dst = linkgraph._edges_numpy(edges)
    pr = linkgraph.pagerank_local(src, dst, result.last_docid)
    want = serial.page_rank(oracle)
    for d, v in want.items():
        assert pr[d] == pytest.approx(v, rel=1e-12), d


def test_hits_parity_local(built):
    _, result, oracle = built
    edges = ray.data.read_parquet(result.edges_dir)
    src, dst = linkgraph._edges_numpy(edges)
    hub, auth = linkgraph.hits_local(src, dst, result.last_docid)
    want_hub, want_auth = serial.hits(oracle)
    for d in want_hub:
        assert hub[d] == pytest.approx(want_hub[d], abs=1e-12), d
        assert auth[d] == pytest.approx(want_auth[d], abs=1e-12), d


def test_pagerank_parity_dataset(built):
    """Distributed groupby-aggregate rounds give the same ranks (fewer
    iterations to keep the test fast; parity is per-round so 5 rounds
    suffice to catch a semantic drift)."""
    _, result, oracle = built
    edges = ray.data.read_parquet(result.edges_dir)
    src, dst = linkgraph._edges_numpy(edges)
    got = linkgraph.pagerank_dataset(edges, result.last_docid, max_iter=5)
    want = linkgraph.pagerank_local(src, dst, result.last_docid, max_iter=5)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_hits_parity_dataset(built):
    _, result, _ = built
    edges = ray.data.read_parquet(result.edges_dir)
    src, dst = linkgraph._edges_numpy(edges)
    got_h, got_a = linkgraph.hits_dataset(edges, result.last_docid, max_iter=5)
    want_h, want_a = linkgraph.hits_local(src, dst, result.last_docid, max_iter=5)
    np.testing.assert_allclose(got_h, want_h, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-12, atol=1e-15)


def test_quality_written_f32(built):
    _, result, oracle = built
    docs = _update_docs_with_quality(result, "local")
    t = pq.read_table(result.docs_dir)
    got = {
        r["docid"]: (r["pr_quality"], r["hub_quality"], r["auth_quality"])
        for r in t.to_pylist()
    }
    for d in oracle.docs.values():
        pr, hub, auth = got[d.docid]
        assert pr == pytest.approx(d.pr_quality, rel=1e-6)
        assert hub == pytest.approx(d.hub_quality, abs=1e-7)
        assert auth == pytest.approx(d.auth_quality, abs=1e-7)


@pytest.fixture(scope="module")
def engine(built):
    table, result, oracle = built
    _update_docs_with_quality(result, "local")
    return QueryEngine(result.out_dir)


def _rank_key(pairs):
    """Rank list with deterministic tie-break (score desc, docid asc),
    scores rounded so fp-noise ties collapse."""
    return [
        (d, round(s, 9))
        for d, s in sorted(pairs, key=lambda p: (-round(p[1], 9), p[0]))
    ]


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity(engine, built, query):
    _, _, oracle = built
    want = serial.process_query(oracle, query)
    got = [(d, s) for d, s, _ in engine.search(query, k=None)]
    assert len(got) == len(want)
    gk, wk = _rank_key(got), _rank_key(want)
    assert [d for d, _ in gk] == [d for d, _ in wk], query
    for (gd, gs), (wd, ws) in zip(gk, wk):
        assert gs == pytest.approx(ws, rel=1e-7, abs=1e-10), (query, gd)


def test_topk_slice(engine, built):
    _, _, oracle = built
    q = "search engine ranking"
    top5 = engine.search(q, k=5)
    allr = engine.search(q, k=None)
    assert [d for d, _, _ in top5] == [d for d, _, _ in allr[:5]]
    assert all(u for _, _, u in top5)


LEGACY_QUERIES = QUERIES + [
    "Search Engine ranking",  # mixed case: stopword filter sees raw words,
    # stemming lowercases, and query.count on the RAW query misses the
    # lowercase stemmed terms (qtf 0 for all-capitalized words)
    "rank ranking page",      # substring-count quirk: "rank" counts 2
]


@pytest.mark.parametrize("query", LEGACY_QUERIES)
def test_legacy_rank_identity(engine, built, query):
    """A9 legacy max-norm scorer vs the serial transcription of
    lib/process_query.py:154-201 (full-df idf, substring query tf,
    max-norm quality)."""
    _, _, oracle = built
    want = serial.process_query_legacy(oracle, query)
    got = [(d, s) for d, s, _ in engine.search_legacy(query, k=None)]
    assert len(got) == len(want), query
    gk, wk = _rank_key(got), _rank_key(want)
    assert [d for d, _ in gk] == [d for d, _ in wk], query
    for (gd, gs), (wd, ws) in zip(gk, wk):
        assert gs == pytest.approx(ws, rel=1e-7, abs=1e-10), (query, gd)


def test_legacy_promotion_parity(ray_session, tmp_path):
    """importance_bug=False: the legacy scorer's 1.2 important-tag
    promotion branch fires (some intersection posting is tagged) and the
    engine still matches the serial oracle.  The driver's simple-index
    oracle can't cover this branch (the simple corpus stores importance 0
    on every posting)."""
    from searchengine_ray import params as P

    table = synthesize_pages(160)
    cfg = P.BuildConfig(importance_bug=False)
    result = build_index(
        ray.data.from_arrow(table).repartition(4), str(tmp_path / "nb"), cfg
    )
    _update_docs_with_quality(result, "local")
    oracle = serial.build(table, cfg)
    serial.apply_quality(oracle)
    eng = QueryEngine(result.out_dir)

    fired = False
    for q in ["search engine ranking", "hub page", "lecture notes course"]:
        want = serial.process_query_legacy(oracle, q)
        got = [(d, s) for d, s, _ in eng.search_legacy(q, k=None)]
        gk, wk = _rank_key(got), _rank_key(want)
        assert [d for d, _ in gk] == [d for d, _ in wk], q
        for (gd, gs), (wd, ws) in zip(gk, wk):
            assert gs == pytest.approx(ws, rel=1e-7, abs=1e-10), (q, gd)
        for t in eng._legacy_terms(q):
            r = eng.fetch(t)
            if r is not None and (r[2] != 0).any():
                fired = True
    assert fired  # the 1.2 branch was actually exercised


def test_bm25_matches_bruteforce(engine):
    import math

    import numpy as np

    from searchengine_ray import params

    for q in ["search engine ranking", "quantum computing", "lecture notes course"]:
        got = engine.search_bm25(q, k=10)
        # brute force: union of all term postings, exact scoring
        from searchengine_ray.functions import tokenizer

        terms = sorted(set(tokenizer.stem_tokens(tokenizer.tokenize(q))))
        rows = [
            (engine._bm25_idf(len(r[0])), r)
            for r in (engine.fetch(t) for t in terms)
            if r is not None
        ]
        union = np.unique(np.concatenate([r[0] for _, r in rows]))
        scores = engine._bm25_score_docs(union, rows)
        order = np.lexsort((union, -scores))[:10]
        want = [(int(union[i]), float(scores[i])) for i in order]
        assert [(d, round(s, 9)) for d, s, _ in got] == [
            (d, round(s, 9)) for d, s in want
        ], q
