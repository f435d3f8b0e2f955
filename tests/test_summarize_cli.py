"""Summaries stage, SummaryStore lookup, n-grams, and the CLI flow."""

import subprocess
import sys

import pytest
import ray.data

from searchengine_ray.functions import tokenizer
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.sources.pages import synthesize_pages
from searchengine_ray.stages.summarize import (
    Summarizer,
    SummaryStore,
    build_summaries,
    collapse_ws,
)
from searchengine_ray.state.checkpoint import StageCheckpoint


def test_ngrams():
    toks = ["a", "b", "c", "d"]
    assert tokenizer.ngrams(toks, 1) == toks
    assert tokenizer.ngrams(toks, 2) == ["a b", "b c", "c d"]
    assert tokenizer.ngrams(toks, 4) == ["a b c d"]
    assert tokenizer.ngrams(["a"], 3) == []


def test_collapse_ws():
    assert collapse_ws("  a\n\tb   c ") == "a b c"


def test_summarizer_real_model_gated():
    with pytest.raises(NotImplementedError):
        Summarizer(fake=False)


def test_summaries_and_store(ray_session, tmp_path):
    table = synthesize_pages(64)
    out = str(tmp_path / "idx")
    result = build_index(ray.data.from_arrow(table).repartition(2), out)
    texts = ray.data.read_parquet(result.texts_dir)
    StageCheckpoint(out, "summaries").write(build_summaries(texts))

    store = SummaryStore(f"{out}/summaries")
    t = texts.take(3)
    for row in t:
        s = store.get(row["docid"])
        assert s == " ".join(collapse_ws(row["text"])[:512].split()[:60])
    assert store.get(10**9) == SummaryStore.FALLBACK


def test_cli_end_to_end(ray_session, tmp_path):
    """makeindex → compute → search via the in-process CLI main()."""
    import pyarrow.parquet as pq

    from searchengine_ray import cli

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(synthesize_pages(64), pages_dir / "pages.parquet")
    out = str(tmp_path / "idx2")

    cli.main(["makeindex", str(pages_dir), "-o", out])
    cli.main(["compute", "-o", out])
    cli.main(["search", "-o", out, "-k", "3", "search engine index"])
    cli.main(["search", "-o", out, "--bm25", "search engine index"])
    cli.main(["summarize", "-o", out])
