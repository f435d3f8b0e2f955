"""Serial oracle: a faithful single-process implementation of the reference
semantics (build → link scores → query), used as ground truth by the parity
tests (SURVEY.md §5, §7 step 1).

It mirrors the reference control flow exactly — the per-doc chain of
``makeindex.py:104-252`` (empty filter → url dedup → exact-hash dedup →
extract → important tags → links → windowed simhash → stem → postings),
``lib/pagerank.py:8-51`` / ``lib/hits.py:15-59`` (including the
break-before-update convergence quirk and the hub/auth-both-from-out-links
quirk), and the scorer of ``lib/queryproc.py:16-270`` (intersected-df idf,
cosine>0.4 gate, candidate-set normalization, stopword heap rule) — but is
written fresh against this repo's own extractor/tokenizer/stemmer, and
processes pages in canonical url order (SURVEY.md §7 step 4: docid = 1-based
rank under ``(defrag(url), url, warc_ts)``).
"""

from __future__ import annotations

import heapq
import math
from collections import deque
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from searchengine_ray import params
from searchengine_ray.functions import hashing, htmlx, tokenizer


@dataclass
class OracleDoc:
    docid: int
    url: str
    total_tokens: int
    pr_quality: float = 1.0
    hub_quality: float = 1.0
    auth_quality: float = 1.0


@dataclass
class OracleIndex:
    # term -> list of (docid, tf, important), docid-ascending
    postings: dict[str, list[tuple[int, int, int]]] = field(default_factory=dict)
    docs: dict[int, OracleDoc] = field(default_factory=dict)
    # accepted docid -> set of out-link defragged urls
    doclinks: dict[int, list[str]] = field(default_factory=dict)
    texts: dict[str, str] = field(default_factory=dict)  # url -> extracted text
    last_docid: int = 0          # docid of last *accepted* doc (mergeinfo)
    num_rows: int = 0            # total input rows (docid high-water mark)
    pruned: int = 0

    @property
    def num_nonempty(self) -> int:
        return len(self.docs)


def canonical_order(table: pa.Table) -> list[int]:
    """Row indices of ``table`` in canonical order (defrag(url), url, warc_ts)."""
    urls = table["url"].to_pylist()
    ts = table["warc_ts"].to_pylist()
    keys = [(htmlx.defrag(u), u, t, i) for i, (u, t) in enumerate(zip(urls, ts))]
    keys.sort()
    return [k[3] for k in keys]


def build(table: pa.Table, cfg: params.BuildConfig | None = None) -> OracleIndex:
    cfg = cfg or params.BuildConfig()
    idx = OracleIndex()
    order = canonical_order(table)
    urls = table["url"].to_pylist()
    htmls = table["html"].to_pylist()

    urls_found: set[str] = set()
    exact_hashes: set[bytes] = set()
    window: deque[int] = deque()

    docid = 0
    for row in order:
        docid += 1
        raw = htmls[row] or b""
        content = raw.decode("utf-8", errors="replace").strip()
        if not content:
            idx.pruned += 1
            continue
        url_d = htmlx.defrag(urls[row])
        if url_d in urls_found:
            continue
        urls_found.add(url_d)

        h = hashing.exact_hash(content)
        if h in exact_hashes:
            continue
        exact_hashes.add(h)

        text, tag_text, links = htmlx.extract(content, url_d)
        tokens = tokenizer.tokenize(text)
        important_tokens = {
            tag: set(tokenizer.tokenize(tag_text.get(tag, "")))
            for tag, _ in params.IMPORTANT_TAGS
        }

        # "auto" resolves to window at any scale this serial oracle can run
        if cfg.near_dup_mode in ("window", "auto"):
            sim = hashing.simhash(tokenizer.word_count(tokens))
            if any(
                hashing.hamming32(sim, other) <= params.SIMHASH_HAMMING_MAX
                for other in window
            ):
                idx.pruned += 1
                continue
            window.append(sim)
            if len(window) > params.SIMHASH_WINDOW:
                window.popleft()

        stemmed = tokenizer.stem_tokens(tokens)
        token_counts = tokenizer.word_count(stemmed)
        total_tokens = len(token_counts)

        for token, count in token_counts.items():
            important = 0
            if not cfg.importance_bug:
                # intended semantics: first matching tag in priority order
                # (note: tag sets hold UNSTEMMED tokens — reference quirk)
                for tag, val in params.IMPORTANT_TAGS:
                    if token in important_tokens[tag]:
                        important = val
                        break
            idx.postings.setdefault(token, []).append((docid, count, important))

        idx.docs[docid] = OracleDoc(docid=docid, url=url_d, total_tokens=total_tokens)
        idx.doclinks[docid] = links
        idx.texts[url_d] = text
        idx.last_docid = docid

    idx.num_rows = len(order)
    return idx


# ------------------------------------------------------------- link graph


def resolve_links(idx: OracleIndex) -> dict[int, set[int]]:
    """URL → docid resolution (``lib/reader.py:104-145``): keep targets that
    are indexed (accepted docs only)."""
    url_to_docid = {d.url: d.docid for d in idx.docs.values()}
    out: dict[int, set[int]] = {}
    for docid, links in idx.doclinks.items():
        out[docid] = {
            url_to_docid[u] for u in links if url_to_docid.get(u) is not None
        }
    return out


def page_rank(idx: OracleIndex) -> dict[int, float]:
    """``lib/pagerank.py:8-51`` verbatim semantics: docs = all docids
    1..last_docid (gap docids are empty docs with no links), init 1/n, no
    teleport normalization, break-before-update on convergence."""
    n = idx.last_docid
    if n == 0:
        return {}
    out_links = resolve_links(idx)
    all_ids = list(range(1, n + 1))
    ranks = {d: 1 / n for d in all_ids}
    in_links: dict[int, set[int]] = {d: set() for d in all_ids}
    for src, targets in out_links.items():
        for t in targets:
            if t in in_links:
                in_links[t].add(src)
    for _ in range(params.PR_MAX_ITER):
        new_ranks = {}
        for d in all_ids:
            s = sum(
                ranks[u] / len(out_links[u]) for u in in_links[d]
            )
            new_ranks[d] = (1 - params.PR_DAMPING) + params.PR_DAMPING * s
        if all(abs(new_ranks[d] - ranks[d]) < params.PR_TOL for d in all_ids):
            break  # reference breaks BEFORE adopting new_ranks
        ranks = new_ranks
    return ranks


def hits(idx: OracleIndex) -> tuple[dict[int, float], dict[int, float]]:
    """``lib/hits.py:15-59`` verbatim semantics, including the quirk that
    BOTH hub and auth sum over a doc's own OUT-links."""
    n = idx.last_docid
    out_links = resolve_links(idx)
    all_ids = list(range(1, n + 1))
    get = lambda d: out_links.get(d, set())
    hub = {d: 1.0 for d in all_ids}
    auth = {d: 1.0 for d in all_ids}
    for _ in range(params.HITS_MAX_ITER):
        new_hub = {d: sum(auth.get(v, 0.0) for v in get(d)) for d in all_ids}
        new_auth = {d: sum(hub.get(v, 0.0) for v in get(d)) for d in all_ids}
        norm = math.sqrt(sum(s * s for s in new_hub.values()))
        if norm > 0:
            new_hub = {d: s / norm for d, s in new_hub.items()}
        norm = math.sqrt(sum(s * s for s in new_auth.values()))
        if norm > 0:
            new_auth = {d: s / norm for d, s in new_auth.items()}
        if all(
            abs(new_hub[d] - hub[d]) < params.HITS_TOL for d in all_ids
        ) and all(abs(new_auth[d] - auth[d]) < params.HITS_TOL for d in all_ids):
            break  # break BEFORE adopting (reference quirk)
        hub, auth = new_hub, new_auth
    return hub, auth


def apply_quality(idx: OracleIndex) -> None:
    """Write pr/hub/auth back into docs, f32-quantized (the reference
    persists them as f32, ``lib/structs.py:58-67``)."""
    pr = page_rank(idx)
    hub, auth = hits(idx)
    for d in idx.docs.values():
        d.pr_quality = float(np.float32(pr.get(d.docid, 1.0)))
        d.hub_quality = float(np.float32(hub.get(d.docid, 1.0)))
        d.auth_quality = float(np.float32(auth.get(d.docid, 1.0)))


# ------------------------------------------------------------- query


def process_query(idx: OracleIndex, query: str) -> list[tuple[int, float]]:
    """``lib/queryproc.py:165-270``: returns (docid, net_score) ranked desc
    (ties: dict insertion order — candidates ordered by first-seen docid)."""
    tokens = tokenizer.tokenize(query)
    tokens = tokenizer.stem_tokens(tokens)
    frequencies = tokenizer.word_count(tokens)

    prune_count = 0
    valid_count = 0
    num_valid_tokens = 0
    stopwords: set[str] = set()
    stopwords_heap: list[tuple[int, int, str]] = []
    for token in sorted(frequencies.keys()):
        postings = idx.postings.get(token, [])
        doc_freq = len(postings)
        if doc_freq == 0:
            if token.isalnum():
                prune_count += frequencies[token]
            del frequencies[token]
            continue
        num_valid_tokens += 1
        valid_count += frequencies[token]
        if tokenizer.is_stopword(token):
            token_freq = frequencies[token]
            if not token_freq:
                continue
            heapq.heappush(stopwords_heap, (doc_freq, token_freq, token))
            stopwords.add(token)
            del frequencies[token]

    if prune_count > valid_count * 2:
        return []

    if len(stopwords) > 0 and not (len(stopwords) < num_valid_tokens * 0.4):
        k = int(math.log2(len(stopwords)))
        for _ in range(k):
            _, freq, token = heapq.heappop(stopwords_heap)
            frequencies[token] = freq

    if not frequencies:
        return []

    # postings_set (lib/queryproc.py:16-42)
    tokenset = list(frequencies.keys())
    docid_postings: dict[int, dict[str, tuple[int, int, int]]] = {}
    docid_sets = []
    for token in tokenset:
        postings = idx.postings.get(token, [])
        s = set()
        for p in postings:
            s.add(p[0])
            docid_postings.setdefault(p[0], {})[token] = p
        docid_sets.append(s)
    query_docids = set.intersection(*docid_sets)
    docid_postings = {
        d: v for d, v in docid_postings.items() if d in query_docids
    }
    token_postings = {
        token: [vec[token] for vec in docid_postings.values()]
        for token in tokenset
    }
    if not docid_postings:
        return []

    scores = _compute_scores(idx, docid_postings, token_postings, frequencies)
    return sorted(scores.items(), key=lambda kv: kv[1], reverse=True)


def _compute_scores(idx, docid_postings, token_postings, query_vec):
    """``lib/queryproc.py:45-162`` verbatim semantics."""
    num_docs = idx.num_nonempty
    doc_tfidfs: dict[int, dict[str, float]] = {d: {} for d in docid_postings}
    idfs: dict[str, float] = {}
    for token, postings in token_postings.items():
        df = 1 + len(postings)  # intersected df (reference quirk A5)
        idf = math.log((1 + num_docs) / df)
        for (docid, tf_raw, important) in postings:
            document = idx.docs[docid]
            tf = tf_raw / document.total_tokens
            tfidf = tf * idf * params.IMPORTANCE[important]
            doc_tfidfs[docid][token] = tfidf
        idfs[token] = idf

    doc_tfidf_sums = {d: sum(v.values()) for d, v in doc_tfidfs.items()}

    query_total = sum(query_vec.values())
    query_tfidf = {
        t: (tf / query_total) * idfs[t] for t, tf in query_vec.items()
    }
    q_norm = math.sqrt(sum(v * v for v in query_tfidf.values()))

    doc_cosine: dict[int, float] = {}
    for docid, doc_tfidf in doc_tfidfs.items():
        dot = sum(doc_tfidf.get(t, 0.0) * v for t, v in query_tfidf.items())
        d_norm = math.sqrt(sum(v * v for v in doc_tfidf.values()))
        denom = d_norm * q_norm
        # divergence: the reference raises ZeroDivisionError when every
        # query term has idf 0 (term present in ALL docs); we define 0.0
        doc_cosine[docid] = dot / denom if denom else 0.0

    sums_norm = math.sqrt(sum(v * v for v in doc_tfidf_sums.values()))
    cos_norm = math.sqrt(sum(v * v for v in doc_cosine.values()))

    net_relevance = {}
    for docid in docid_postings:
        nt = doc_tfidf_sums[docid] / sums_norm if sums_norm else 0.0
        nc = doc_cosine[docid] / cos_norm if cos_norm else 0.0
        net_relevance[docid] = (
            params.TFIDF_FACTOR * nt + params.COSINE_FACTOR * nc
            if doc_cosine[docid] > params.COSINE_GATE
            else 0.0
        )

    prs = {d: idx.docs[d].pr_quality for d in docid_postings}
    hubs = {d: idx.docs[d].hub_quality for d in docid_postings}
    auths = {d: idx.docs[d].auth_quality for d in docid_postings}
    pr_norm = math.sqrt(sum(v * v for v in prs.values()))
    hub_norm = math.sqrt(sum(v * v for v in hubs.values()))
    auth_norm = math.sqrt(sum(v * v for v in auths.values()))

    net_scores = {}
    for docid in docid_postings:
        npr = prs[docid] / pr_norm if pr_norm else 0.0
        nhub = hubs[docid] / hub_norm if hub_norm else 0.0
        nauth = auths[docid] / auth_norm if auth_norm else 0.0
        quality = (
            params.PR_FACTOR * npr
            + params.HUB_FACTOR * nhub
            + params.AUTH_FACTOR * nauth
        )
        net_scores[docid] = (
            params.NET_RELEVANCE_FACTOR * net_relevance[docid]
            + params.QUALITY_FACTOR * quality
        )
    return net_scores


def process_query_legacy(idx: OracleIndex, query: str) -> list[tuple[int, float]]:
    """``lib/process_query.py:154-201`` verbatim semantics (the legacy
    max-norm scorer, SURVEY §2 A9 — dead code in the reference: neither
    ``search.py`` nor ``searcht.py`` imports this module's scorer).

    Quirks kept faithfully: whitespace split -> raw-word stopword filter
    -> Porter stem (``:55-57``); full-df idf ``log2((N+1)/(df+1))``
    (``:98`` — NOT the live scorer's intersected-df quirk A5); query tf
    counts SUBSTRING occurrences of the stemmed word in the raw query
    string (``query.count(word)``, ``:101`` — "slow" counts twice in
    "slow slowest"); ``1+ln(tf)`` doc weights with a flat 1.2 promotion
    on any important tag (``:87,115-116``); per-doc L2 cosine; quality =
    pr/max + hub/max + auth/max + cosine with maxes over the intersection
    candidates (``:31-48,186-191``).  Divergence: when every query weight
    is 0 (no stemmed word is a substring of the raw query) the reference
    raises ZeroDivisionError at ``:145``; we return []."""
    # NLTK's PorterStemmer.stem lowercases its input; the stopword filter
    # sees the raw (possibly mixed-case) word first (:55-57)
    stemmed = tokenizer.stem_tokens(
        [w.lower() for w in query.split() if not tokenizer.is_stopword(w)]
    )
    # dict-keyed postings: duplicates collapse, insertion order kept (:67-75)
    postings: dict[str, list[tuple[int, int, int]]] = {}
    doc_sets = []
    for word in stemmed:
        plist = idx.postings.get(word, [])
        if plist:
            postings[word] = plist
            doc_sets.append({p[0] for p in plist})
    if not doc_sets:
        return []
    common = set.intersection(*doc_sets)
    if not common:
        return []

    max_pr = max(idx.docs[d].pr_quality for d in common)
    max_hub = max(idx.docs[d].hub_quality for d in common)
    max_auth = max(idx.docs[d].auth_quality for d in common)

    PROMOTION_MUL = 1.2
    doc_count = idx.num_nonempty
    doc_vectors: dict[int, dict[str, float]] = {}
    query_vector: dict[str, float] = {}
    query_length = 0.0
    for word, plist in postings.items():
        idf = math.log2((doc_count + 1) / (len(plist) + 1))
        qtf = query.count(word)  # substring count on the RAW query (:101)
        qtf_w = 1 + math.log(qtf) if qtf > 0 else 0
        qw = qtf_w * idf
        query_vector[word] = qw
        query_length += qw**2
        for docid, tf, important in plist:
            if docid not in common:
                continue
            w = 1 + math.log(tf) if tf > 0 else 0
            if important:
                w *= PROMOTION_MUL
            doc_vectors.setdefault(docid, {})[word] = w
    query_length = math.sqrt(query_length)
    if query_length == 0:
        return []  # divergence: reference ZeroDivisionError (:145)

    scores: dict[int, float] = {}
    for docid, weights in doc_vectors.items():
        dlen = math.sqrt(sum(w**2 for w in weights.values()))
        cos = sum(
            (w / dlen) * (query_vector[t] / query_length)
            for t, w in weights.items()
        )
        npr = idx.docs[docid].pr_quality / max_pr if max_pr > 0 else 0
        nhub = idx.docs[docid].hub_quality / max_hub if max_hub > 0 else 0
        nauth = idx.docs[docid].auth_quality / max_auth if max_auth > 0 else 0
        scores[docid] = npr + nhub + nauth + cos
    return sorted(scores.items(), key=lambda kv: kv[1], reverse=True)
