"""CLI entry points mirroring the reference's executables so a user of the
reference can switch 1:1 (SURVEY.md §3):

    python -m searchengine_ray.cli makeindex PAGES_PARQUET_DIR -o INDEX_DIR
        ≙ ``python makeindex.py path/to/pages`` (resumable: rerun with the
        same -o skips completed stages)
    python -m searchengine_ray.cli compute -o INDEX_DIR
        ≙ ``python compute.py`` (PageRank + HITS written onto docs)
    python -m searchengine_ray.cli search -o INDEX_DIR [-k 5] [--bm25|--legacy] [QUERY...]
        ≙ ``python search.py`` / ``searcht.py`` (no QUERY args → REPL)
    python -m searchengine_ray.cli summarize -o INDEX_DIR
        ≙ ``python summarizer.py`` (stub model, see stages/summarize.py)

Owns the Ray session (guarded init), per the driver contract.
"""

from __future__ import annotations

import argparse
import sys
import time


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_makeindex(args) -> None:
    ray = _ray()
    import ray.data

    from searchengine_ray.pipelines.build import build_index

    pages = ray.data.read_parquet(args.pages)
    t0 = time.perf_counter()
    result = build_index(pages, args.out)
    dt = time.perf_counter() - t0
    print(
        f"indexed {result.num_docs} docs / {result.num_rows} rows, "
        f"{result.num_terms} terms in {dt:.1f}s "
        f"({result.num_rows / max(dt, 1e-9):.1f} rows/s) -> {args.out}"
    )


def cmd_compute(args) -> None:
    ray = _ray()
    import ray.data

    from searchengine_ray.pipelines import linkgraph
    from searchengine_ray.pipelines.build import _load_manifest
    from searchengine_ray.state.checkpoint import StageCheckpoint

    result = _load_manifest(args.out)
    if result is None:
        sys.exit(f"no completed index at {args.out}; run makeindex first")
    docs = ray.data.read_parquet(result.docs_dir)
    edges = ray.data.read_parquet(result.edges_dir)
    t0 = time.perf_counter()
    updated = linkgraph.compute_quality(
        edges, docs, result.last_docid, method=args.method
    )
    StageCheckpoint(args.out, "docs").write(updated)
    print(f"pagerank+hits ({args.method}) in {time.perf_counter() - t0:.1f}s")


def cmd_search(args) -> None:
    import os

    _ray()
    from searchengine_ray.pipelines.query import QueryEngine
    from searchengine_ray.stages.summarize import SummaryStore

    engine = QueryEngine(args.out)
    if args.bm25:
        mode = engine.search_bm25
    elif args.legacy:
        mode = engine.search_legacy  # A9 max-norm scorer (lib/process_query.py)
    else:
        mode = engine.search
    store = None
    if args.summaries:
        sdir = os.path.join(args.out, "summaries")
        store = SummaryStore(sdir) if os.path.isdir(sdir) else None

    def run(q: str) -> None:
        t0 = time.perf_counter()
        hits = mode(q, args.k)
        dt = (time.perf_counter() - t0) * 1000
        print(f"# {q!r} ({dt:.1f} ms)")
        for rank, (docid, score, url) in enumerate(hits, 1):
            print(f"{rank:3d}. {score:.6f}  doc {docid}  {url}")
            if args.summaries:
                s = store.get(docid) if store else SummaryStore.FALLBACK
                print(f"     {s}")

    if args.query:
        for q in args.query:
            run(q)
    else:
        print("query (empty line to quit):")
        for line in sys.stdin:
            q = line.strip()
            if not q:
                break
            run(q)


def cmd_serve(args) -> None:
    """Web frontend (reference ``search.py``): query box, 5/10/20/all
    selector, summaries + latency in the rendering."""
    _ray()
    from searchengine_ray.web import create_app

    app = create_app(args.out, bm25=args.bm25, legacy=args.legacy)
    print(f"serving http://{args.host}:{args.port}/ (ctrl-c to stop)")
    app.run(host=args.host, port=args.port, debug=False)


def cmd_summarize(args) -> None:
    ray = _ray()
    import ray.data

    from searchengine_ray.pipelines.build import _load_manifest
    from searchengine_ray.stages.summarize import build_summaries
    from searchengine_ray.state.checkpoint import StageCheckpoint

    result = _load_manifest(args.out)
    if result is None:
        sys.exit(f"no completed index at {args.out}")
    texts = ray.data.read_parquet(result.texts_dir)
    StageCheckpoint(args.out, "summaries").write(build_summaries(texts))
    print("summaries written")


def cmd_stats(args) -> None:
    """Doc/term counts sanity tool (reference ``print_result.py:12-35``)."""
    import json
    import os

    path = os.path.join(args.out, "manifest.json")
    if not os.path.exists(path):
        sys.exit(f"no completed index at {args.out}")
    with open(path) as f:
        m = json.load(f)
    print(f"total input rows : {m['num_rows']}")
    print(f"indexed documents: {m['num_docs']} (last docid {m['last_docid']})")
    print(f"distinct terms   : {m['num_terms']}")
    print(
        "pruned           : "
        f"{m['pruned_empty']} empty, {m['pruned_url']} url-dup, "
        f"{m['pruned_exact']} exact-dup, {m['pruned_neardup']} near-dup"
    )
    print(f"avg doc length   : {m['avgdl']:.1f} tokens")
    for stage, secs in m.get("wall_s", {}).items():
        print(f"  wall {stage:<16s} {secs:.2f}s")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="searchengine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    mi = sub.add_parser("makeindex")
    mi.add_argument("pages")
    mi.add_argument("-o", "--out", required=True)
    mi.set_defaults(fn=cmd_makeindex)

    co = sub.add_parser("compute")
    co.add_argument("-o", "--out", required=True)
    co.add_argument(
        "--method", choices=["auto", "local", "dataset", "join"], default="auto"
    )
    co.set_defaults(fn=cmd_compute)

    se = sub.add_parser("search")
    se.add_argument("-o", "--out", required=True)
    se.add_argument("-k", type=int, default=5)
    se.add_argument("--bm25", action="store_true")
    se.add_argument("--legacy", action="store_true")
    se.add_argument("--summaries", action="store_true")
    se.add_argument("query", nargs="*")
    se.set_defaults(fn=cmd_search)

    sv = sub.add_parser("serve")
    sv.add_argument("-o", "--out", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("-p", "--port", type=int, default=5000)
    sv.add_argument("--bm25", action="store_true")
    sv.add_argument("--legacy", action="store_true")
    sv.set_defaults(fn=cmd_serve)

    su = sub.add_parser("summarize")
    su.add_argument("-o", "--out", required=True)
    su.set_defaults(fn=cmd_summarize)

    st = sub.add_parser("stats")
    st.add_argument("-o", "--out", required=True)
    st.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
