"""Web frontend smoke (reference ``search.py`` + ``templates/search.html``
parity): query box POST, 5/10/20/all selector, summaries + latency in the
rendering — exercised through the Flask HTTP test client."""

import pytest
import ray.data

from searchengine_ray.pipelines.build import build_index
from searchengine_ray.sources.pages import synthesize_pages
from searchengine_ray.stages.summarize import SummaryStore, build_summaries
from searchengine_ray.state.checkpoint import StageCheckpoint

flask = pytest.importorskip("flask")


@pytest.fixture(scope="module")
def web_index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("webidx") / "idx")
    result = build_index(ray.data.from_arrow(synthesize_pages(64)), out)
    StageCheckpoint(out, "summaries").write(
        build_summaries(ray.data.read_parquet(result.texts_dir))
    )
    return out


@pytest.fixture(scope="module")
def client(web_index):
    from searchengine_ray.web import create_app

    app = create_app(web_index)
    app.config["TESTING"] = True
    return app.test_client()


def test_legacy_mode_serves(web_index):
    """A9 legacy scorer reachable through the web surface
    (create_app(legacy=True) ≙ ``cli serve --legacy``)."""
    from searchengine_ray.web import create_app

    app = create_app(web_index, legacy=True)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.post("/", data={"query": "search engine index", "num_results": "5"})
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    assert "Results for:" in body
    assert "Score:" in body


def test_get_renders_form(client):
    r = client.get("/")
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    assert 'name="query"' in body
    assert 'name="num_results"' in body
    for opt in ("5", "10", "20", "all"):
        assert f'value="{opt}"' in body


def test_post_query_renders_results(client):
    r = client.post("/", data={"query": "search engine index", "num_results": "5"})
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    assert "Results for:" in body
    assert "Query time:" in body
    assert "Score:" in body
    assert "Summary:" in body
    assert 'target="_blank"' in body


def test_post_all_results(client):
    r5 = client.post("/", data={"query": "search engine index", "num_results": "5"})
    rall = client.post(
        "/", data={"query": "search engine index", "num_results": "all"}
    )
    assert rall.status_code == 200
    assert rall.get_data(as_text=True).count("<li>") >= r5.get_data(
        as_text=True
    ).count("<li>")


def test_summary_fallback_used_without_store(ray_session, tmp_path):
    """An index without a summaries dataset renders the reference fallback
    string (lib/queryproc.py:296-297)."""
    out = str(tmp_path / "idx_nosumm")
    build_index(ray.data.from_arrow(synthesize_pages(48)), out)
    from searchengine_ray.web import create_app

    app = create_app(out)
    app.config["TESTING"] = True
    r = app.test_client().post(
        "/", data={"query": "search engine index", "num_results": "5"}
    )
    assert SummaryStore.FALLBACK in r.get_data(as_text=True)


def test_format_results_escapes_crawled_content():
    """url and summary come from crawled documents — format_results_web must
    escape them before they hit the |safe template slot (stored XSS)."""
    from searchengine_ray.web import format_results_web

    class EvilStore:
        def get(self, docid):
            return '<script>alert(1)</script>'

    rows = [(1, 0.5, 'https://x/"><script>alert(2)</script>')]
    out = format_results_web(rows, 5, EvilStore())
    assert len(out) == 1
    assert "<script>" not in out[0]
    assert "&lt;script&gt;" in out[0]
    assert "&#34;&gt;" in out[0] or "&quot;&gt;" in out[0]
