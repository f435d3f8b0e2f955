"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

BASELINE.json's input_hint mandates the input shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No such table exists in /root/testdata, so tests and benchmarks synthesize it
here with a fixed seed (no external data). The ``text`` column is produced by
this repo's own extractor (:mod:`searchengine_ray.functions.htmlx`), which
makes "byte-identical extracted text per url" a closed, testable invariant of
the distributed pipeline.

The generated corpus covers every branch of the reference build loop
(FIXTURES.md §1): empty pages, fragment-duplicate urls, exact content
duplicates, simhash near-duplicates inside and outside the 200-doc window,
important tags, link structure (relative/absolute/dangling/empty-target,
hub + clique), punctuation-heavy code, stopword saturation, non-ASCII
tokens, and one oversized page.

URLs are constructed so that canonical url order == generation order
(zero-padded paths), which keeps the order-dependent reference semantics
(first-wins dedup, the 200-doc simhash window) controllable.
"""

from __future__ import annotations

import datetime
import random

import pyarrow as pa

from searchengine_ray.functions import hashing, htmlx, tokenizer

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH = datetime.datetime(2024, 1, 1)

# seeded vocabulary: stopword-ish glue + content words (Zipf-sampled)
_CONTENT_WORDS = (
    "search engine index posting token document ranking crawl parquet arrow "
    "ray dataset batch shuffle actor stream block spill merge sort hash term "
    "frequency cosine vector quality pagerank hits hub authority link graph "
    "stemming tokenizer corpus query retrieval score relevance partition "
    "segment bucket compression varbyte delta encode decode checkpoint "
    "lineage manifest resume throughput scaling efficiency cluster node "
    "memory heap object store backpressure pipeline operator aggregate "
    "algorithm structure binary tree graph notation assignment lecture notes "
    "course gaming python dynamically typed language candy store china "
    "quantum computing dishonesty cheating policy professor student campus "
    "library research paper conference journal citation abstract method "
    "result analysis experiment dataset baseline metric evaluation"
).split()
_GLUE_WORDS = "the a of to and in is it that for on with as at by from".split()

# expand the vocabulary with deterministic pseudo-words so page simhashes are
# distinguishable (a tiny shared vocab makes every page a near-duplicate,
# unlike real webtext); fixed local seed keeps this independent of page seed
_SYLLABLES = (
    "ba re mo ti lex cor ten al us ing er ion an or da net sys ic pro gen "
    "ve ta ran dom ser qui lo mar fin pla"
).split()


def _make_vocab() -> list[str]:
    vrng = random.Random(1234)
    vocab = list(_CONTENT_WORDS)
    for _ in range(4000):
        w = "".join(vrng.choice(_SYLLABLES) for _ in range(vrng.randint(2, 4)))
        vocab.append(w)
    return vocab


_VOCAB = _make_vocab()


def _zipf_choices(rng: random.Random, words: list[str], k: int) -> list[str]:
    n = len(words)
    out = []
    for _ in range(k):
        # Zipf-ish: rank r with p ~ 1/r via inverse CDF approximation
        r = int(n ** rng.random()) - 1
        out.append(words[min(r, n - 1)])
    return out


def _sentence(rng: random.Random, nwords: int, topic: int = 0) -> str:
    """Zipf-sampled words, rank-rotated by a per-page ``topic`` offset so
    different pages have different head terms (otherwise long docs converge
    to one simhash and everything looks near-duplicate)."""
    n = len(_VOCAB)
    ws = []
    for i in range(nwords):
        if rng.random() < 0.2:
            ws.append(rng.choice(_GLUE_WORDS))
        else:
            r = int(n ** rng.random()) - 1
            ws.append(_VOCAB[(topic + max(r, 0)) % n])
    return " ".join(ws)


def _url(i: int) -> str:
    return f"https://www.example.org/docs/p{i:06d}.html"


def _page_html(rng: random.Random, i: int, n: int) -> str:
    topic = rng.randrange(len(_VOCAB))
    parts = ["<html><head><title>", _sentence(rng, rng.randint(2, 4), topic), "</title>"]
    if rng.random() < 0.2:
        parts.append(f"<script>var t={i};</script>")
    parts.append("</head><body>")
    if rng.random() < 0.6:
        parts.append(f"<h1>{_sentence(rng, rng.randint(2, 5), topic)}</h1>")
    for htag in ("h2", "h3", "h4"):
        if rng.random() < 0.25:
            parts.append(f"<{htag}>{_sentence(rng, rng.randint(2, 4), topic)}</{htag}>")
    npara = rng.randint(4, 10)
    for _ in range(npara):
        words = _sentence(rng, rng.randint(30, 80), topic)
        if rng.random() < 0.4:
            emph = rng.choice(["b", "strong", "mark"])
            words += f" <{emph}>{_sentence(rng, rng.randint(1, 3), topic)}</{emph}>"
        parts.append(f"<p>{words}</p>")
    # links: a few forward/backward refs (deterministic graph), occasional
    # dangling target, relative link, fragment link
    nlinks = rng.randint(0, 5)
    for j in range(nlinks):
        roll = rng.random()
        if roll < 0.55:
            tgt = _url((i * 7 + j * 13 + 1) % n)
        elif roll < 0.7:
            tgt = f"/docs/p{(i * 3 + j + 1) % n:06d}.html"  # relative
        elif roll < 0.8:
            tgt = _url((i + j + 1) % n) + f"#sec{j}"  # fragment link
        else:
            tgt = f"https://dangling{j}.example.net/x{i}"  # not indexed
        parts.append(f'<a href="{tgt}">{_sentence(rng, 2, topic)}</a>')
    parts.append("</body></html>")
    return "".join(parts)


def _near_dup_of(html: str, rng: random.Random) -> str:
    """A near-duplicate: append one extra occurrence of an existing word so
    the unigram-count simhash stays within Hamming distance 3."""
    base_tokens = tokenizer.tokenize(htmlx.extract(html, "http://x/")[0])
    base_sim = hashing.simhash(tokenizer.word_count(base_tokens))
    for cand in _CONTENT_WORDS:
        variant = html.replace("</body></html>", f"<p>{cand}</p></body></html>")
        toks = tokenizer.tokenize(htmlx.extract(variant, "http://x/")[0])
        sim = hashing.simhash(tokenizer.word_count(toks))
        if hashing.hamming32(base_sim, sim) <= 3:
            return variant
    return html  # exact dup fallback (still pruned, by D2 instead)


def synthesize_pages(n: int, seed: int = 42) -> pa.Table:
    """Build a deterministic ``pages`` table of ``n`` rows."""
    rng = random.Random(seed)
    rows: list[dict] = []

    special: dict[int, str] = {}
    if n >= 40:
        special[5] = "empty"
        special[8] = "fragdup"      # url of row 7 + #fragment
        special[12] = "exactdup"    # html identical to row 11
        special[15] = "neardup"     # near-dup of row 14 (inside window)
        special[20] = "code"
        special[22] = "stopwords"
        special[25] = "nonascii"
        special[30] = "hub"
        special[33] = "bigpage"
    if n >= 300:
        special[280] = "neardup_far"  # near-dup of row 40, > 200 accepted apart

    prev_html: dict[int, str] = {}
    for i in range(n):
        kind = special.get(i, "plain")
        url = _url(i)
        if kind == "empty":
            html = "   \n  "
        elif kind == "fragdup":
            url = _url(i - 1) + "#section-2"
            html = _page_html(rng, i, n)
        elif kind == "exactdup":
            html = prev_html[i - 1]
        elif kind == "neardup":
            html = _near_dup_of(prev_html[i - 1], rng)
        elif kind == "neardup_far":
            html = _near_dup_of(prev_html[40], rng)
        elif kind == "code":
            html = (
                "<html><body><p>example program: print(\"Hello world!\") "
                "and big O notation O(n log n)</p></body></html>"
            )
        elif kind == "stopwords":
            html = (
                "<html><body><p>to be or not to be that is the question "
                "whether it is nobler in the mind</p></body></html>"
            )
        elif kind == "nonascii":
            html = (
                "<html><body><p>the émigré café über straße "
                f"{_sentence(rng, 10)}</p></body></html>"
            )
        elif kind == "hub":
            links = "".join(
                f'<a href="{_url(j)}">hub link</a>' for j in range(0, min(n, 40), 2)
            )
            html = f"<html><body><h1>hub page</h1>{links}</body></html>"
        elif kind == "bigpage":
            html = (
                "<html><body>"
                + "".join(f"<p>{_sentence(rng, 200)}</p>" for _ in range(60))
                + "</body></html>"
            )
        else:
            html = _page_html(rng, i, n)

        prev_html[i] = html
        content = html.strip()
        text = htmlx.extract(content, htmlx.defrag(url))[0] if content else ""
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + datetime.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en" if kind != "nonascii" else "de",
            }
        )

    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def _doc_rows_to_pages(
    doc_ids, texts, langs, n_total: int, replica: int
) -> list[dict]:
    """Deterministic page synthesis from document rows: url/warc_ts derive
    from the (replicated) id; html wraps the text with a title, an emphasis
    span, and an id-derived link graph.  ``replica`` > 0 produces distinct
    content (suffix token) and distinct urls so replicas aren't dedup-pruned."""
    rows = []
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        gid = int(doc_id) + replica * n_total
        if replica == 0:
            body = text
        else:
            # enough distinct unigrams to move the simhash > 3 bits — a
            # single extra token leaves replicas inside the near-dup ball
            salt_words = " ".join(f"r{replica}x{doc_id}{c}" for c in "abcdefghij")
            body = f"{text} " + " ".join([salt_words] * 5)
        words = body.split()
        title = " ".join(words[:3]) if words else "untitled"
        bold = words[3] if len(words) > 3 else ""
        nlinks = gid % 4
        links = "".join(
            f'<a href="https://docs.example.org/d{(gid * 7 + j + 1) % (n_total * (replica + 1)):08d}.html">l</a>'
            for j in range(nlinks)
        )
        html = (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{body}</p><b>{bold}</b>{links}</body></html>"
        )
        url = f"https://docs.example.org/d{gid:08d}.html"
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + datetime.timedelta(seconds=gid),
                "html": html.encode("utf-8"),
                "text": htmlx.extract(html.strip(), url)[0],
                "lang": lang,
            }
        )
    return rows


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Driver-side variant (small sf only): documents → pages Arrow table."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    rows = _doc_rows_to_pages(
        t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist(),
        t.num_rows, 0,
    )
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


SIMPLE_URL_PREFIX = "https://s.example.org/"


def simple_url(doc_id: int) -> str:
    """SQL-expressible url: ``'https://s.example.org/' || lpad(doc_id, 8, '0')``.
    Zero-padding makes lexicographic url order == doc_id order, so the
    build's canonical docid = ``row_number() OVER (ORDER BY doc_id)``."""
    return f"{SIMPLE_URL_PREFIX}{doc_id:08d}"


def simple_link_targets(doc_id: int, n_total: int) -> list[int]:
    """Deterministic, SQL-expressible link rule: ``doc_id % 4`` targets at
    ``(doc_id*7 + j*3 + 1) % n_total`` (deduped).  The DuckDB oracle
    reproduces it with ``UNNEST(generate_series(...))``."""
    return sorted({(doc_id * 7 + j * 3 + 1) % n_total for j in range(doc_id % 4)})


def simple_pages_dataset(sf_dir: str):
    """SQL-parity pages synthesis for the oracle-checked build variant
    (``BuildConfig(tokenizer="simple")``): the html payload is the raw
    document text + a NUL separator + newline-joined link urls — every
    byte the pipeline consumes is reproducible in DuckDB SQL, so the
    driver's oracle can hash-check docs/postings/edges/PageRank of the
    REAL distributed build (docid sort, dedup groupbys, posting shuffle,
    varbyte encode/decode) end-to-end.

    Every ``doc_id % 7 == 3`` document additionally emits an EXACT
    duplicate page under ``https://z.example.org/...`` — the z prefix sorts
    after every original, so originals keep docids 1..n and the D2
    exact-hash dedup must prune every duplicate (first-wins by canonical
    docid) for the oracles to hold: the docs/postings/edges/PageRank
    comparisons therefore externally verify the dedup groupbys too, with
    no oracle-side modelling.  (Document texts in the driver's testdata
    are unique, so no accidental extra dedup fires.)
    """
    import pyarrow.parquet as pq
    import ray.data

    n_total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def to_pages(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text, lang in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            links = [simple_url(t) for t in simple_link_targets(doc_id, n_total)]
            payload = (text or "") + "\x00" + "\n".join(links)
            rows.append(
                {
                    "url": simple_url(doc_id),
                    "warc_ts": _EPOCH + datetime.timedelta(seconds=doc_id),
                    "html": payload.encode("utf-8"),
                    "text": text or "",
                    "lang": lang,
                }
            )
            if doc_id % 7 == 3:  # planted exact dup — D2 must prune it
                rows.append(
                    {
                        "url": f"https://z.example.org/{doc_id:08d}",
                        "warc_ts": _EPOCH + datetime.timedelta(seconds=doc_id),
                        "html": payload.encode("utf-8"),
                        "text": text or "",
                        "lang": lang,
                    }
                )
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow", batch_size=256)


def pages_dataset_from_documents(sf_dir: str, replicas: int = 1):
    """Distributed pages synthesis: documents Dataset → pages Dataset with
    ``replicas`` distinct copies (benchmark corpus scaling).  The html/text
    synthesis (including the extractor call) runs inside ``map_batches`` —
    no driver-side row loop."""
    import pyarrow.parquet as pq
    import ray.data

    n_total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        rows: list[dict] = []
        for rep in range(replicas):
            rows.extend(_doc_rows_to_pages(ids, texts, langs, n_total, rep))
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    # cap the input batch so the ×replicas expansion stays a modest block
    # (256 docs × replicas rows out per call)
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow", batch_size=256)
