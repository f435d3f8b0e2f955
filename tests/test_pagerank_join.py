"""Join-based (10^12-scale) PageRank parity vs the local/broadcast modes."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from searchengine_ray.pipelines import linkgraph
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    table = synthesize_pages(160)
    out = str(tmp_path_factory.mktemp("idx_prj"))
    return build_index(ray.data.from_arrow(table).repartition(4), out)


def test_pagerank_join_matches_local(built):
    edges = ray.data.read_parquet(built.edges_dir)
    docs = ray.data.read_parquet(built.docs_dir).select_columns(["docid"])
    src, dst = linkgraph._edges_numpy(edges)
    want = linkgraph.pagerank_local(src, dst, built.last_docid, max_iter=4)

    got_ds = linkgraph.pagerank_dataset_join(
        edges, docs, built.last_docid, max_iter=4
    )
    got = {r["docid"]: r["rank"] for r in got_ds.take_all()}
    ids = pq.read_table(built.docs_dir)["docid"].to_pylist()
    assert set(got) == set(ids)
    for d in ids:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d


def test_pagerank_join_full_convergence(built):
    """Full 25-iteration run (with early break) matches local exactly."""
    edges = ray.data.read_parquet(built.edges_dir)
    docs = ray.data.read_parquet(built.docs_dir).select_columns(["docid"])
    src, dst = linkgraph._edges_numpy(edges)
    want = linkgraph.pagerank_local(src, dst, built.last_docid)
    got = {
        r["docid"]: r["rank"]
        for r in linkgraph.pagerank_dataset_join(
            edges, docs, built.last_docid
        ).take_all()
    }
    for d, v in got.items():
        assert v == pytest.approx(want[d], rel=1e-12), d


def test_compute_quality_join_mode_matches_local(built):
    """End-to-end wiring parity: compute_quality(method='join') — the path
    auto selects above AUTO_JOIN_EDGE_THRESHOLD — writes the same f32
    pr/hub/auth columns onto docs as the local mode (tol=0 pins both to
    fixed 25 rounds so convergence-order noise can't differ)."""
    edges = ray.data.read_parquet(built.edges_dir)
    docs = ray.data.read_parquet(built.docs_dir)

    def scores(method):
        out = linkgraph.compute_quality(
            edges, docs, built.last_docid, method=method, pr_tol=0.0, hits_tol=0.0
        )
        return {
            r["docid"]: (r["pr_quality"], r["hub_quality"], r["auth_quality"])
            for r in out.take_all()
        }

    local = scores("local")
    join = scores("join")
    assert set(local) == set(join)
    for d in local:
        for a, b in zip(local[d], join[d]):
            assert a == pytest.approx(b, rel=1e-6), d


def test_hits_join_matches_local(built):
    edges = ray.data.read_parquet(built.edges_dir)
    docs = ray.data.read_parquet(built.docs_dir).select_columns(["docid"])
    src, dst = linkgraph._edges_numpy(edges)
    want_h, want_a = linkgraph.hits_local(src, dst, built.last_docid, max_iter=3)

    got = {
        r["docid"]: (r["hub"], r["auth"])
        for r in linkgraph.hits_dataset_join(
            edges, docs, built.last_docid, max_iter=3
        ).take_all()
    }
    ids = pq.read_table(built.docs_dir)["docid"].to_pylist()
    assert set(got) == set(ids)
    for d in ids:
        assert got[d][0] == pytest.approx(want_h[d], abs=1e-12), d
        assert got[d][1] == pytest.approx(want_a[d], abs=1e-12), d
