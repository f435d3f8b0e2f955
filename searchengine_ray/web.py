"""Flask web frontend — parity with the reference's ``search.py:11-73`` +
``templates/search.html``: a query box, a result-count selector
(5/10/20/all), ranked results formatted like
``lib/queryproc.py:287-301`` ``format_results_web`` (rank, linked url,
2-decimal score, summary with the "Summary not found" fallback), and the
query latency in milliseconds.

The engine loads once at app construction (the reference's
``initialize()`` at startup); queries run in-process against the built
index.  ``python -m searchengine_ray.cli serve -o INDEX_DIR`` runs it.
"""

from __future__ import annotations

import os
import time

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="UTF-8">
<title>Search Engine</title>
<style>
 body { font-family: sans-serif; margin: 2rem auto; max-width: 48rem; }
 form { margin-bottom: 1.5rem; }
 input[type=text] { width: 24rem; padding: .3rem; }
 .results li { margin-bottom: .8rem; }
 .query-time, .results-count { color: #666; font-size: .9rem; }
</style>
</head>
<body>
<div class="container">
  <h1>Search Engine</h1>
  <form method="post">
    <label for="query">Enter Query:</label>
    <input type="text" id="query" name="query" required value="{{ query }}">
    <label for="num_results">Number of Results:</label>
    <select id="num_results" name="num_results">
      <option value="5">5</option>
      <option value="10">10</option>
      <option value="20">20</option>
      <option value="all">All</option>
    </select>
    <button type="submit">Search</button>
  </form>
  {% if results %}
  <div class="results">
    <h2>Results for: "{{ query }}"</h2>
    <p class="results-count">Number of results: {{ total_results }}</p>
    <ul>
      {% for result in results %}
      <li>{{ result|safe }}</li>
      {% endfor %}
    </ul>
  </div>
  <p class="query-time">Query time: {{ query_time }} milliseconds</p>
  {% endif %}
</div>
</body>
</html>"""


def format_results_web(ranked, k: int, summary_store) -> list[str]:
    """``lib/queryproc.py:287-301`` formatting: rank, linked url, 2-decimal
    score, per-doc summary (fallback included).  url and summary derive
    from crawled content, so they are escaped before interpolation into
    the self-built markup (the template renders these strings |safe)."""
    from markupsafe import escape

    from searchengine_ray.stages.summarize import SummaryStore

    out = []
    for rank, (docid, score, url) in enumerate(ranked[:k], 1):
        url = escape(url or "URL not found")
        summary = escape(
            summary_store.get(docid) if summary_store else SummaryStore.FALLBACK
        )
        out.append(
            f'{rank}. <a href="{url}" target="_blank">{url}</a> '
            f"(Score: {score:.2f})<br>Summary: {summary}"
        )
    return out


def create_app(index_dir: str, bm25: bool = False, legacy: bool = False):
    from flask import Flask, render_template_string, request

    from searchengine_ray.pipelines.query import QueryEngine
    from searchengine_ray.stages.summarize import SummaryStore

    engine = QueryEngine(index_dir)
    summaries_dir = os.path.join(index_dir, "summaries")
    store = SummaryStore(summaries_dir) if os.path.isdir(summaries_dir) else None
    app = Flask(__name__)

    @app.route("/", methods=["GET", "POST"])
    def search():
        results: list[str] = []
        query_time = 0.0
        query = ""
        total_results = 0
        if request.method == "POST":
            query = request.form.get("query", "")
            num_results = request.form.get("num_results", "5")
            start = time.time_ns()
            if bm25:
                k = 1000 if num_results == "all" else int(num_results)
                ranked = engine.search_bm25(query, k=k)
            elif legacy:
                # A9 max-norm scorer (lib/process_query.py)
                ranked = engine.search_legacy(query, k=None)
            else:
                # reference shape: score ALL candidates, slice afterwards
                ranked = engine.search(query, k=None)
            query_time = (time.time_ns() - start) / 1_000_000
            total_results = len(ranked)
            k = total_results if num_results == "all" else int(num_results)
            results = format_results_web(ranked, k, store)
        return render_template_string(
            TEMPLATE,
            results=results,
            query_time=query_time,
            query=query,
            total_results=total_results,
        )

    return app
