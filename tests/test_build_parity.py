"""End-to-end parity: distributed build vs the serial oracle (SURVEY.md §5).

Asserts on the synthesized pages table (which exercises every reference
branch, FIXTURES.md §1):

- byte-identical extracted text per url (BASELINE.json per-row invariant)
- identical docs table (docid, url, total_tokens)
- identical decoded posting lists (term → [(docid, tf, important)])
- identical resolved edge set
- dedup prune accounting
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from searchengine_ray import params
from searchengine_ray.oracle import serial
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.sources.pages import synthesize_pages
from searchengine_ray.stages.postings import decode_segment_row

N_PAGES = 320


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    table = synthesize_pages(N_PAGES)
    out = str(tmp_path_factory.mktemp("index"))
    ds = ray.data.from_arrow(table).repartition(8)
    result = build_index(ds, out)
    oracle = serial.build(table)
    return table, result, oracle


def _read(dirname):
    import pyarrow.parquet as pq

    return pq.read_table(dirname)


def test_docs_parity(built):
    _, result, oracle = built
    got = _read(result.docs_dir).sort_by("docid")
    want = sorted(oracle.docs.values(), key=lambda d: d.docid)
    assert result.num_docs == len(want)
    assert got["docid"].to_pylist() == [d.docid for d in want]
    assert got["url"].to_pylist() == [d.url for d in want]
    assert got["total_tokens"].to_pylist() == [d.total_tokens for d in want]
    assert result.last_docid == oracle.last_docid
    assert result.num_rows == oracle.num_rows


def test_text_byte_identity(built):
    _, result, oracle = built
    texts = _read(result.texts_dir)
    got = dict(zip(texts["url"].to_pylist(), texts["text"].to_pylist()))
    assert got == oracle.texts


def test_postings_parity(built):
    _, result, oracle = built
    seg = _read(result.segments_dir)
    got = {}
    for row in seg.to_pylist():
        docids, tfs, imps = decode_segment_row(row)
        got[row["term"]] = list(zip(docids.tolist(), tfs.tolist(), imps.tolist()))
        assert row["df"] == len(docids)
    assert set(got) == set(oracle.postings)
    for term, want in oracle.postings.items():
        assert got[term] == want, term
    assert result.num_terms == len(oracle.postings)


def test_edges_parity(built):
    _, result, oracle = built
    edges = _read(result.edges_dir)
    got = set(zip(edges["src"].to_pylist(), edges["dst"].to_pylist()))
    want = {
        (src, dst) for src, dsts in serial.resolve_links(oracle).items() for dst in dsts
    }
    assert got == want


def test_prune_accounting(built):
    table, result, oracle = built
    # oracle.pruned counts empty + neardup (reference counters)
    assert result.pruned_empty + result.pruned_neardup + result.pruned_url \
        + result.pruned_exact == result.num_rows - result.num_docs
    assert result.pruned_neardup >= 1  # fixture has an in-window near-dup
    assert result.pruned_url >= 1
    assert result.pruned_exact >= 1
    assert result.pruned_empty >= 1


def test_block_max_metadata(built):
    _, result, _ = built
    seg = _read(result.segments_dir)
    k1 = params.BM25_K1
    for row in seg.to_pylist()[:50]:
        docids, tfs, _ = decode_segment_row(row)
        nblocks = (len(docids) + params.BLOCK_MAX_SIZE - 1) // params.BLOCK_MAX_SIZE
        assert len(row["block_last"]) == nblocks
        assert row["block_last"][-1] == docids[-1]
        # bound must upper-bound the unsaturated tf term contribution
        assert max(row["block_bound"]) <= (max(tfs) * (k1 + 1)) / k1 + 1e-6


def test_resume_skips_completed(built, tmp_path):
    table, result, _ = built
    # second call with same out_dir returns from manifest without recompute
    import time

    t0 = time.perf_counter()
    again = build_index(None, result.out_dir)  # pages unused on full resume
    assert time.perf_counter() - t0 < 1.0
    assert again.num_docs == result.num_docs
    assert again.num_terms == result.num_terms


def test_intended_importance_parity(ray_session, tmp_path):
    """importance_bug=False (intended semantics: first matching tag id)
    must match the oracle's non-bug path — and differ from the bug path."""
    from searchengine_ray import params as P

    table = synthesize_pages(120)
    cfg = P.BuildConfig(importance_bug=False)
    result = build_index(
        ray.data.from_arrow(table).repartition(4), str(tmp_path / "nb"), cfg
    )
    oracle = serial.build(table, P.BuildConfig(importance_bug=False))

    seg = _read(result.segments_dir)
    got = {}
    any_nonzero = False
    for row in seg.to_pylist():
        docids, tfs, imps = decode_segment_row(row)
        got[row["term"]] = list(zip(docids.tolist(), tfs.tolist(), imps.tolist()))
        any_nonzero = any_nonzero or any(imps)
    assert any_nonzero  # fixture has <title>/<h1>/<b> wrapped tokens
    assert set(got) == set(oracle.postings)
    for term, want in oracle.postings.items():
        assert got[term] == want, term
