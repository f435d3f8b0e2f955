"""Benchmark harness (driver contract: one JSON line on stdout).

Headline pipeline: the full index build — pages → dedup cascade → extract
actor pool → posting groupby → varbyte segments — over a pages corpus
synthesized (distributed, cached to /tmp parquet) from
``$GRAFT_SF_DIR/documents.parquet`` with ``--replicas`` distinct copies.
Also timed: link-graph scoring, the reference + BM25 query set, and three
training-data operators.

    python bench.py                 # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # fresh-process runs at 8 and 32 CPUs on
                                    # the SAME input + scaling efficiency

JSON shape: {"metric": ..., "value": <headline sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
DEFAULT_REPLICAS = int(os.environ.get("GRAFT_BENCH_REPLICAS", "4"))
# near-dup mode for the benchmarked build: "window" replicates the
# reference's serial 200-doc semantics (parity default); "lsh" is the
# distributed scale path.  The scaling runs use lsh — the serial window
# scan is a deliberate parity artifact, not the at-scale configuration.
NEARDUP = os.environ.get("GRAFT_BENCH_NEARDUP", "window")
# bench artifacts live on tmpfs when available: the scaling comparison
# measures the engine, not one shared VM disk (real cluster nodes have
# per-node local storage); falls back to /tmp transparently
SCRATCH = "/dev/shm/se_bench" if os.path.isdir("/dev/shm") else "/tmp"



def _prepare_pages(sf_dir: str, replicas: int) -> str:
    """Synthesize the bench pages corpus once (distributed) and cache it."""
    import ray.data

    from searchengine_ray.sources.pages import pages_dataset_from_documents

    tag = os.path.basename(os.path.normpath(sf_dir))
    os.makedirs(SCRATCH, exist_ok=True)
    # file count bounds read parallelism for every leg that consumes the
    # corpus: the first ×768 runs cached 17 files, which capped the
    # 32-CPU legs' ReadParquet at 17 concurrent tasks and showed up as
    # ~40 s of CPU-count-independent extract wall.  256 files keeps any
    # leg ≤ 256 CPUs read-parallel.
    n_files = min(256, max(16, replicas))
    out = f"{SCRATCH}/bench_pages_{tag}_x{replicas}_p{n_files}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    pages_dataset_from_documents(sf_dir, replicas).repartition(
        n_files
    ).write_parquet(out)
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    return out


def run_bench(sf_dir: str, num_cpus: int, replicas: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from searchengine_ray.pipelines import linkgraph, ops
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import QueryEngine
    from searchengine_ray.state.checkpoint import StageCheckpoint

    timings: dict[str, float] = {}
    pages_dir = _prepare_pages(sf_dir, replicas)
    n_pages = ray.data.read_parquet(pages_dir).count()

    # ---- headline: index build (fresh output dir each run) --------------
    out_dir = f"{SCRATCH}/bench_index_{os.getpid()}"
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    from searchengine_ray.params import BuildConfig

    # keep_text=False: the texts dataset is an optional product artifact
    # (summaries/byte-identity); the headline build omits its extra write
    cfg = BuildConfig(near_dup_mode=NEARDUP, keep_text=False)
    t0 = time.perf_counter()
    result = build_index(ray.data.read_parquet(pages_dir), out_dir, cfg)
    t_build = time.perf_counter() - t0
    timings["index_build"] = t_build

    if os.environ.get("GRAFT_BENCH_BUILD_ONLY"):
        # scaling legs: the efficiency criterion reads only index_build;
        # skipping the query/op extras halves each leg's exposure to the
        # VM's noise windows
        payload = {
            "metric": "index_build_e2e_sec",
            "value": round(t_build, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "n_pages": n_pages,
            "n_docs": result.num_docs,
            "n_terms": result.num_terms,
            "docs_per_sec": round(n_pages / t_build, 1),
            "neardup_mode": NEARDUP,
            "build_stage_wall_s": {
                k: round(v, 2) for k, v in result.wall_s.items()
            },
        }
        shutil.rmtree(out_dir, ignore_errors=True)
        ray.shutdown()
        return payload

    # ---- link-graph scoring --------------------------------------------
    t0 = time.perf_counter()
    docs = ray.data.read_parquet(result.docs_dir)
    edges = ray.data.read_parquet(result.edges_dir)
    updated = linkgraph.compute_quality(edges, docs, result.last_docid, "auto")
    StageCheckpoint(out_dir, "docs").write(updated)
    timings["linkgraph"] = time.perf_counter() - t0

    # join-mode rounds (the 10^12-doc path): time 3 PageRank + 3 HITS
    # dataset-join rounds and report the per-round wall — at this corpus
    # size the full 25 rounds are pure fixed overhead (auto picks local),
    # but the per-round cost is what scales, so measure it explicitly
    t0 = time.perf_counter()
    # fresh read: the quality write above replaced the docs files
    accepted = ray.data.read_parquet(result.docs_dir).select_columns(["docid"])
    linkgraph.pagerank_dataset_join(
        edges, accepted, result.last_docid, max_iter=3, tol=0.0
    ).materialize()
    linkgraph.hits_dataset_join(
        edges, accepted, result.last_docid, max_iter=3, tol=0.0
    ).materialize()
    t_join = time.perf_counter() - t0
    timings["linkgraph_join_6rounds"] = t_join
    timings["linkgraph_join_per_round"] = t_join / 6.0

    # ---- query serving --------------------------------------------------
    from __ray_entry__ import SEARCH_QUERIES

    engine = QueryEngine(out_dir)
    t0 = time.perf_counter()
    n_results = 0
    for q in SEARCH_QUERIES:
        n_results += len(engine.search(q, k=5))
    timings["query_reference"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for q in SEARCH_QUERIES:
        engine.search_bm25(q, k=10)
    timings["query_bm25"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for q in SEARCH_QUERIES:
        engine.search_legacy(q, k=5)
    timings["query_legacy"] = time.perf_counter() - t0

    # ---- training-data operators ---------------------------------------
    for name, fn in [
        ("term_df", ops.term_df),
        ("minhash_dedup", ops.minhash_dedup),
        ("knn_cosine", ops.knn_cosine),
    ]:
        t0 = time.perf_counter()
        fn(sf_dir).materialize()
        timings[name] = time.perf_counter() - t0

    payload = {
        "metric": "index_build_e2e_sec",
        "value": round(t_build, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "n_docs": result.num_docs,
        "n_terms": result.num_terms,
        "docs_per_sec": round(n_pages / t_build, 1),
        "neardup_mode": NEARDUP,
        "build_stage_wall_s": {k: round(v, 2) for k, v in result.wall_s.items()},
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return payload


def run_scaling(sf_dir: str, replicas: int, low: int = 8, high: int = 32) -> dict:
    """Same job, two parallelism levels, fresh processes (the sandbox stand-in
    for the N vs 4N cluster-size criterion)."""
    results = {}
    for cpus in (low, high):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(cpus),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_BENCH_REPLICAS=str(replicas),
            GRAFT_BENCH_NEARDUP=os.environ.get("GRAFT_BENCH_NEARDUP", "lsh"),
            GRAFT_BENCH_BUILD_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(
                f"scaling subprocess (cpus={cpus}) produced no JSON; "
                f"rc={out.returncode}\nstderr tail:\n"
                + "\n".join(out.stderr.strip().splitlines()[-25:])
                + "\n"
            )
            sys.exit(1)
        results[cpus] = json.loads(lines[-1])
    tl, th = results[low]["value"], results[high]["value"]
    eff = (tl / th) / (high / low)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"cpus_{low}_sec": tl,
            f"cpus_{high}_sec": th,
            f"docs_per_sec_{low}": results[low]["docs_per_sec"],
            f"docs_per_sec_{high}": results[high]["docs_per_sec"],
        },
        "sf": sf_dir,
        "num_cpus": high,
        "low": results[low],
        "high": results[high],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replicas", type=int, default=DEFAULT_REPLICAS)
    ap.add_argument("--low", type=int, default=4, help="N CPUs")
    ap.add_argument("--high", type=int, default=16, help="4N CPUs")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling(SF_DIR, args.replicas, args.low, args.high)))
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS, args.replicas)))
