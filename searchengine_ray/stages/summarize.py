"""Optional summaries dataset (reference S10/M12: ``summarizer.py``,
``lib/writer.py:353-364``, ``lib/reader.py:147-180``).

The reference runs HuggingFace BART (``facebook/bart-large-cnn``) over the
first 512 chars of each doc's whitespace-collapsed text, 20–60 token
summaries, single-process (20–40 h for the full corpus,
``README.txt:64-65``).  Rebuilt as the canonical stateful-model actor-pool
stage: the model loads once per actor in ``__init__``; ``__call__``
summarizes a batch.  Transformers is not in this container, so the model
path raises ``NotImplementedError`` unless ``fake=True``, which applies
the reference's *input* transform (whitespace-collapse + 512-char truncate,
``summarizer.py:32-37``) and emits a deterministic leading-words summary so
the pipeline plumbing (schema, actor signature, join at result formatting)
is real and tested.
"""

from __future__ import annotations

import pyarrow as pa

SUMMARY_SCHEMA = pa.schema([("docid", pa.int64()), ("summary", pa.string())])


def collapse_ws(text: str) -> str:
    """``' '.join(text.split())`` — the summarizer's text normalization
    (``summarizer.py:32-37``)."""
    return " ".join(text.split())


class Summarizer:
    MAX_INPUT_CHARS = 512   # summarizer.py:25-30
    MIN_TOKENS = 20
    MAX_TOKENS = 60

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "facebook/bart-large-cnn needs transformers (not in this "
                "container); construct Summarizer(fake=True) for the "
                "deterministic stub"
            )

    def _summarize_one(self, text: str) -> str:
        clipped = collapse_ws(text)[: self.MAX_INPUT_CHARS]
        words = clipped.split()
        return " ".join(words[: self.MAX_TOKENS])

    def __call__(self, batch: pa.Table) -> pa.Table:
        summaries = [self._summarize_one(t or "") for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"docid": batch["docid"], "summary": pa.array(summaries, pa.string())},
            schema=SUMMARY_SCHEMA,
        )


def build_summaries(texts_ds, concurrency=(1, 4), batch_size: int = 32):
    """texts dataset (docid, url, text) → summaries dataset.  In a GPU
    deployment, pass ``num_gpus`` through ``map_batches``."""
    return texts_ds.select_columns(["docid", "text"]).map_batches(
        Summarizer,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SummaryStore:
    """Query-time docid → summary lookup (``lib/reader.py:147-180``);
    missing docs get the reference's fallback string
    (``lib/queryproc.py:296-297``)."""

    FALLBACK = "Summary not found"  # exact string, lib/queryproc.py:296-297

    def __init__(self, summaries_dir: str) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(summaries_dir)
        self._d = dict(zip(t["docid"].to_pylist(), t["summary"].to_pylist()))

    def get(self, docid: int) -> str:
        return self._d.get(docid, self.FALLBACK)
