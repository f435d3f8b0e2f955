"""Query engine over the built index (SURVEY.md §3.3 rebuild trace).

A :class:`QueryEngine` instance holds the docs table as dense
docid-indexed numpy arrays plus the segments manifest (the reference loads
docinfo + seek tables into RAM at startup, ``lib/reader.py:33-101``), and
answers queries by reading only the needed term rows from the Parquet
segments (predicate pushdown on the ``term`` column within the term's hash
bucket — the Parquet footer stats play the reference's ``.seek`` file,
SURVEY.md §1.3).  Per-term posting rows are LRU-cached
(``lib/reader.py:229``'s ``lru_cache(256)``).

Three scoring modes:

- :meth:`search` — the reference-exact scorer (``lib/queryproc.py:165-270``),
  vectorized: stopword/zero-df validation with the df-min-heap rule,
  conjunctive docid intersection, tf-idf with the intersected-df idf quirk
  (A5), the cosine>0.4 gate, candidate-set L2 normalization, and the
  0.61/0.39 relevance/quality mix.  Ties broken docid-ascending
  (the reference relies on dict order — SURVEY.md §7 risks).
- :meth:`search_bm25` — the additional disjunctive BM25 top-k mode with
  block-max WAND skipping over the stored per-block bounds (north_star;
  no reference counterpart).
- :meth:`search_legacy` — the legacy max-norm scorer
  (``lib/process_query.py:154-201``, SURVEY §2 A9), quirks included.

Designed for serving as a Ray actor pool: build one engine per actor in
``__init__`` and evaluate query batches in ``__call__``
(:class:`QueryActor`).
"""

from __future__ import annotations

import heapq
import json
import math
import os
import zlib
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray import params
from searchengine_ray.functions import tokenizer, varbyte


class QueryEngine:
    def __init__(self, index_dir: str, cache_size: int = 256) -> None:
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        self.num_docs = manifest["num_docs"]          # non-empty docs (N)
        self.last_docid = manifest["last_docid"]
        self.avgdl = manifest["avgdl"]
        self.num_buckets = int(manifest["config"]["num_term_buckets"])
        # query tokenization mirrors the build config (manifest carries it):
        # "simple" indexes are unstemmed simple_tokens (the SQL-parity
        # variant), "reference" is tokenize+Porter
        self.tokenizer_mode = manifest["config"].get("tokenizer", "reference")
        # stem queries with the same mode the index was built with
        # ("nltk" = reference NLTK_EXTENSIONS behavior, "porter" = 1980 paper)
        from searchengine_ray.functions import porter

        self._stemmer = porter.CachedStemmer(
            manifest["config"].get("stemmer_mode", porter.DEFAULT_MODE)
        )

        docs = pq.read_table(os.path.join(index_dir, "docs"))
        n = self.last_docid + 1
        self.total_tokens = np.zeros(n, dtype=np.int64)
        self.doc_len = np.zeros(n, dtype=np.int64)
        self.pr = np.zeros(n, dtype=np.float32)
        self.hub = np.zeros(n, dtype=np.float32)
        self.auth = np.zeros(n, dtype=np.float32)
        ids = docs["docid"].to_numpy()
        self.total_tokens[ids] = docs["total_tokens"].to_numpy()
        self.doc_len[ids] = docs["doc_len"].to_numpy()
        self.pr[ids] = docs["pr_quality"].to_numpy()
        self.hub[ids] = docs["hub_quality"].to_numpy()
        self.auth[ids] = docs["auth_quality"].to_numpy()
        # urls stay an Arrow column + a sorted docid array; top-k hits
        # (k ≤ 20) resolve by searchsorted at result-format time.  A
        # docid→str Python dict would cost GBs of Python objects per actor
        # at 10^8+ docs (VERDICT r4 next#6).
        url_order = np.argsort(ids, kind="stable")
        self._url_docids = ids[url_order]
        self._url_col = docs["url"].combine_chunks().take(
            pa.array(url_order)
        )
        self.segments_dir = os.path.join(index_dir, "segments")
        # per-bucket seek tables: [(ParquetFile, rg min terms, rg max terms)]
        self._seg_seek: dict[int, list] = {}
        self._cache: OrderedDict[str, tuple | None] = OrderedDict()
        self._cache_size = cache_size

    def _url(self, docid: int) -> str:
        """Resolve one docid's url by searchsorted into the sorted docid
        array (called only for final top-k hits, k ≤ 20)."""
        pos = int(np.searchsorted(self._url_docids, docid))
        if pos < self._url_docids.size and int(self._url_docids[pos]) == docid:
            return self._url_col[pos].as_py()
        return ""

    # ------------------------------------------------------------ postings

    _FETCH_COLS = [
        "term", "docids_vb", "tfs_vb", "fields", "block_last", "block_bound",
    ]

    def _bucket_seek(self, bucket: int) -> list:
        """Lazy per-bucket seek table from the Parquet footers alone: each
        segment file is term-sorted (the shard encoder sorts by term), so
        the per-row-group (min, max) term statistics are disjoint ascending
        ranges — the rebuild's ``.seek`` file (``lib/reader.py:88-101``),
        read without touching any data pages."""
        seek = self._seg_seek.get(bucket)
        if seek is None:
            seek = []
            path = os.path.join(self.segments_dir, f"bucket={bucket}")
            if os.path.isdir(path):
                for name in sorted(os.listdir(path)):
                    if not name.endswith(".parquet"):
                        continue
                    pf = pq.ParquetFile(os.path.join(path, name))
                    md = pf.metadata
                    names = [md.schema.column(i).name for i in range(md.num_columns)]
                    ci = names.index("term")
                    mins, maxs = [], []
                    for i in range(md.num_row_groups):
                        st = md.row_group(i).column(ci).statistics
                        if st is None or not st.has_min_max:
                            # stats absent: unbounded range (always probed)
                            mins.append("")
                            maxs.append("\U0010ffff")
                        else:
                            mins.append(st.min)
                            maxs.append(st.max)
                    seek.append((pf, mins, maxs))
            self._seg_seek[bucket] = seek
        return seek

    def fetch(self, term: str):
        """(docids, tfs, importants, block_last, block_bound) or None.

        Cold path: binary-search each bucket file's row-group term ranges,
        decompress exactly one row group (``SEGMENT_ROW_GROUP_SIZE`` rows)
        from the one file whose range covers the term — the term lives in
        exactly one shard file (crc-sharded at build).  Warm path: LRU
        (``lib/reader.py:229``'s ``lru_cache(256)``)."""
        import bisect

        if term in self._cache:
            self._cache.move_to_end(term)
            return self._cache[term]
        bucket = zlib.crc32(term.encode("utf-8")) % self.num_buckets
        row = None
        for pf, mins, maxs in self._bucket_seek(bucket):
            i = bisect.bisect_left(maxs, term)  # first rg with max >= term
            sel = -1
            # probe forward while the rg range can still cover the term:
            # stats min/max may be truncated supersets of the true range,
            # so a miss in rg i falls through to i+1 (one probe in the
            # common untruncated case — ranges are disjoint ascending)
            while i < len(maxs) and mins[i] <= term:
                # cheap membership probe on the term column alone — the
                # range covers the term in one rg of EVERY bucket file
                # (terms are hash-scattered across shard files), so most
                # probes miss; the posting columns are read only on hit
                probe = pf.read_row_group(i, columns=["term"])
                sel = pc.index(pc.equal(probe["term"], term), True).as_py()
                if sel >= 0:
                    t = pf.read_row_group(i, columns=self._FETCH_COLS)
                    break
                i += 1
            if sel < 0:
                continue
            r = t.slice(sel, 1).to_pylist()[0]
            docids, tfs = varbyte.decode_postings(r["docids_vb"], r["tfs_vb"])
            imps = np.frombuffer(r["fields"], dtype=np.uint8).astype(np.int64)
            row = (
                docids,
                tfs,
                imps,
                np.asarray(r["block_last"], dtype=np.int64),
                np.asarray(r["block_bound"], dtype=np.float64),
            )
            break
        self._cache[term] = row
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return row

    def _qtokens(self, query: str) -> list[str]:
        if self.tokenizer_mode == "simple":
            return tokenizer.simple_tokens(query)
        return tokenizer.stem_tokens(tokenizer.tokenize(query), self._stemmer)

    # ------------------------------------------------------- reference mode

    def _validate(self, query: str) -> dict[str, int] | None:
        """Tokenize/stem/count + the zero-df/stopword validation pass
        (``lib/queryproc.py:172-230``).  Returns surviving term→freq or
        None for an aborted (empty) result."""
        tokens = self._qtokens(query)
        frequencies = tokenizer.word_count(tokens)

        prune_count = valid_count = num_valid = 0
        stop_heap: list[tuple[int, int, str]] = []
        stopwords: set[str] = set()
        for token in sorted(frequencies):
            row = self.fetch(token)
            df = len(row[0]) if row else 0
            if df == 0:
                if token.isalnum():
                    prune_count += frequencies[token]
                del frequencies[token]
                continue
            num_valid += 1
            valid_count += frequencies[token]
            if tokenizer.is_stopword(token):
                tf = frequencies[token]
                if not tf:
                    continue
                heapq.heappush(stop_heap, (df, tf, token))
                stopwords.add(token)
                del frequencies[token]

        if prune_count > valid_count * 2:
            return None
        if stopwords and not (len(stopwords) < num_valid * 0.4):
            for _ in range(int(math.log2(len(stopwords)))):
                _, freq, token = heapq.heappop(stop_heap)
                frequencies[token] = freq
        return frequencies or None

    def search(self, query: str, k: int | None = 5) -> list[tuple[int, float, str]]:
        """Reference-exact scoring; returns [(docid, net_score, url)] ranked
        desc, ties docid-asc; ``k=None`` returns all candidates."""
        frequencies = self._validate(query)
        if not frequencies:
            return []
        tokenset = list(frequencies.keys())
        fetched = {t: self.fetch(t) for t in tokenset}

        # conjunctive intersection (J3) over sorted docid arrays
        cand = None
        for t in sorted(tokenset, key=lambda t: len(fetched[t][0])):
            ids = fetched[t][0]
            cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
            if cand.size == 0:
                return []

        T, C = len(tokenset), cand.size
        tf = np.empty((T, C), dtype=np.float64)
        imp = np.empty((T, C), dtype=np.int64)
        for i, t in enumerate(tokenset):
            ids, tfs, imps, *_ = fetched[t]
            pos = np.searchsorted(ids, cand)
            tf[i] = tfs[pos]
            imp[i] = imps[pos]

        # intersected-df idf (A5 quirk): df = 1 + |C| for every term
        idf = math.log((1 + self.num_docs) / (1 + C))
        importance = np.asarray(params.IMPORTANCE, dtype=np.float64)
        tfidf = (tf / self.total_tokens[cand][None, :]) * idf * importance[imp]
        doc_sums = tfidf.sum(axis=0)

        qtotal = sum(frequencies.values())
        qvec = np.array(
            [frequencies[t] / qtotal * idf for t in tokenset], dtype=np.float64
        )
        q_norm = math.sqrt(float((qvec**2).sum()))
        d_norm = np.sqrt((tfidf**2).sum(axis=0))
        denom = d_norm * q_norm
        with np.errstate(invalid="ignore", divide="ignore"):
            cosine = np.where(denom > 0, (tfidf * qvec[:, None]).sum(axis=0) / denom, 0.0)

        sums_norm = math.sqrt(float((doc_sums**2).sum()))
        cos_norm = math.sqrt(float((cosine**2).sum()))
        nt = doc_sums / sums_norm if sums_norm else np.zeros(C)
        nc = cosine / cos_norm if cos_norm else np.zeros(C)
        relevance = np.where(
            cosine > params.COSINE_GATE,
            params.TFIDF_FACTOR * nt + params.COSINE_FACTOR * nc,
            0.0,
        )

        def _qnorm(v: np.ndarray) -> np.ndarray:
            nrm = math.sqrt(float((v**2).sum()))
            return v / nrm if nrm else np.zeros_like(v)

        prs = self.pr[cand].astype(np.float64)
        hubs = self.hub[cand].astype(np.float64)
        auths = self.auth[cand].astype(np.float64)
        quality = (
            params.PR_FACTOR * _qnorm(prs)
            + params.HUB_FACTOR * _qnorm(hubs)
            + params.AUTH_FACTOR * _qnorm(auths)
        )
        net = params.NET_RELEVANCE_FACTOR * relevance + params.QUALITY_FACTOR * quality

        order = np.lexsort((cand, -net))
        if k is not None:
            order = order[:k]
        return [(int(cand[i]), float(net[i]), self._url(int(cand[i]))) for i in order]

    # ---------------------------------------------------------- legacy mode

    def _legacy_terms(self, query: str) -> list[str]:
        """The legacy scorer's query pipeline (``lib/process_query.py:55-57``):
        whitespace split -> raw-word stopword filter -> Porter stem (NLTK's
        ``stem`` lowercases its input).  The simple-index variant swaps the
        split+stem for the build's simple tokenizer, keeping the raw-word
        stopword filter."""
        if self.tokenizer_mode == "simple":
            words = tokenizer.simple_tokens(query)
            return [w for w in words if not tokenizer.is_stopword(w)]
        return [
            self._stemmer.stem(w.lower())
            for w in query.split()
            if not tokenizer.is_stopword(w)
        ]

    def search_legacy(
        self, query: str, k: int | None = 5
    ) -> list[tuple[int, float, str]]:
        """The legacy max-norm scorer (SURVEY §2 A9, ``lib/process_query.py:
        154-201`` — dead code in the reference, kept for parity): conjunctive
        intersection, full-df idf ``log2((N+1)/(df+1))`` (NOT the live
        scorer's intersected-df quirk), query tf = SUBSTRING count of the
        stemmed word in the raw query (``query.count(word)``, ``:101``),
        ``1+ln(tf)`` doc weights with a flat 1.2 promotion on any important
        tag, per-doc L2 cosine, and quality = pr/max + hub/max + auth/max
        + cosine with maxes over the intersection candidates.  Ties broken
        docid-ascending (the reference relies on dict order).  Divergence:
        an all-zero query vector raises ZeroDivisionError in the reference
        (``:145``); we return []."""
        terms = list(dict.fromkeys(self._legacy_terms(query)))
        fetched = {t: r for t in terms if (r := self.fetch(t)) is not None}
        if not fetched:
            return []
        tokenset = list(fetched.keys())

        cand = None
        for t in sorted(tokenset, key=lambda t: len(fetched[t][0])):
            ids = fetched[t][0]
            cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
            if cand.size == 0:
                return []

        T, C = len(tokenset), cand.size
        w = np.empty((T, C), dtype=np.float64)
        qw = np.empty(T, dtype=np.float64)
        for i, t in enumerate(tokenset):
            ids, tfs, imps, *_ = fetched[t]
            idf = math.log2((self.num_docs + 1) / (len(ids) + 1))
            pos = np.searchsorted(ids, cand)
            dtf = 1.0 + np.log(tfs[pos].astype(np.float64))
            w[i] = np.where(imps[pos] != 0, dtf * 1.2, dtf)
            qtf = query.count(t)  # substring count on the RAW query
            qw[i] = (1.0 + math.log(qtf)) * idf if qtf > 0 else 0.0
        qlen = math.sqrt(float((qw**2).sum()))
        if qlen == 0:
            return []
        dlen = np.sqrt((w**2).sum(axis=0))
        cosine = ((w / dlen[None, :]) * (qw / qlen)[:, None]).sum(axis=0)

        def _maxnorm(v: np.ndarray) -> np.ndarray:
            m = float(v.max())
            return v / m if m > 0 else np.zeros_like(v)

        score = (
            _maxnorm(self.pr[cand].astype(np.float64))
            + _maxnorm(self.hub[cand].astype(np.float64))
            + _maxnorm(self.auth[cand].astype(np.float64))
            + cosine
        )
        order = np.lexsort((cand, -score))
        if k is not None:
            order = order[:k]
        return [
            (int(cand[i]), float(score[i]), self._url(int(cand[i])))
            for i in order
        ]

    # ------------------------------------------------------------ BM25 mode

    def _bm25_idf(self, df: int) -> float:
        return math.log(1.0 + (self.num_docs - df + 0.5) / (df + 0.5))

    def _bm25_score_docs(self, cand: np.ndarray, rows: list) -> np.ndarray:
        """Exact BM25 score of each candidate docid over all query terms
        (vectorized searchsorted lookups into each docid-sorted list)."""
        k1, b = params.BM25_K1, params.BM25_B
        dl = self.doc_len[cand].astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / max(self.avgdl, 1e-9))
        total = np.zeros(cand.size, dtype=np.float64)
        for idf, (ids, tfs, *_rest) in rows:
            pos = np.searchsorted(ids, cand)
            pos_c = np.minimum(pos, ids.size - 1)
            hit = ids[pos_c] == cand
            tf = np.where(hit, tfs[pos_c], 0).astype(np.float64)
            total += idf * tf * (k1 + 1.0) / (tf + norm)
        return total

    def search_bm25(self, query: str, k: int = 10) -> list[tuple[int, float, str]]:
        """Disjunctive BM25 top-k — vectorized max-score with block-max
        pruning (exact; same top-k as brute force).

        Terms are processed in descending max-impact order (idf × stored
        block-bound max).  The first term's postings seed the top-k
        threshold θ.  A doc absent from all terms processed so far can
        score at most the remaining terms' suffix bound — once that is ≤ θ
        no new candidates can qualify and the scan stops (max-score rule,
        Turtle & Flood 1995).  Within a still-essential term, whole
        128-posting blocks are skipped when ``idf·block_bound + suffix``
        can't beat θ (block-max, Ding & Suel 2011) — vectorized with a
        repeat-mask, no per-posting Python loop.
        """
        tokens = self._qtokens(query)
        terms = sorted(set(tokens))
        fetched = [(t, self.fetch(t)) for t in terms]
        rows = [
            (self._bm25_idf(len(r[0])), r) for _, r in fetched if r is not None
        ]
        if not rows:
            return []
        rows.sort(key=lambda ir: -(ir[0] * float(ir[1][4].max())))
        max_impact = np.array([idf * float(r[4].max()) for idf, r in rows])
        suffix = np.concatenate([np.cumsum(max_impact[::-1])[::-1], [0.0]])

        bs = params.BLOCK_MAX_SIZE
        scores = np.empty(0, dtype=np.float64)
        cand_all = np.empty(0, dtype=np.int64)
        theta = -np.inf
        for i, (idf, (ids, tfs, imps, blast, bbound)) in enumerate(rows):
            if cand_all.size >= k and suffix[i] < theta:
                break  # no unseen doc can reach the top-k (ties kept: a
                # tied doc with lower docid would outrank the incumbent)
            new = ids[~np.isin(ids, cand_all, assume_unique=True)] if cand_all.size else ids
            if cand_all.size >= k and new.size:
                # block-max prune within this term's new candidates
                bound = idf * bbound + suffix[i + 1]
                keep_block = bound >= theta
                posting_keep = np.repeat(keep_block, bs)[: ids.size]
                live = ids[posting_keep]
                new = new[np.isin(new, live, assume_unique=True)]
            if new.size == 0:
                continue
            new_scores = self._bm25_score_docs(new, rows)
            cand_all = np.concatenate([cand_all, new])
            scores = np.concatenate([scores, new_scores])
            if cand_all.size >= k:
                theta = np.partition(scores, -k)[-k]

        order = np.lexsort((cand_all, -scores))[:k]
        return [
            (int(cand_all[i]), float(scores[i]), self._url(int(cand_all[i])))
            for i in order
        ]


class QueryActor:
    """Actor-pool batch evaluator: ``ray.data.from_items(queries)
    .map_batches(QueryActor, fn_constructor_args=(index_dir,), ...)``."""

    def __init__(self, index_dir: str, k: int = 5, mode: str = "reference") -> None:
        self.engine = QueryEngine(index_dir)
        self.k = k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, queries = batch["qid"].to_pylist(), batch["query"].to_pylist()
        out = {"qid": [], "rank": [], "docid": [], "score": [], "url": []}
        fns = {
            "reference": self.engine.search,
            "bm25": self.engine.search_bm25,
            "legacy": self.engine.search_legacy,
        }
        for qid, q in zip(qids, queries):
            fn = fns[self.mode]
            for rank, (docid, score, url) in enumerate(fn(q, self.k), 1):
                out["qid"].append(qid)
                out["rank"].append(rank)
                out["docid"].append(docid)
                out["score"].append(score)
                out["url"].append(url)
        return pa.table(
            {
                "qid": pa.array(out["qid"], pa.int32()),
                "rank": pa.array(out["rank"], pa.int32()),
                "docid": pa.array(out["docid"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
                "url": pa.array(out["url"], pa.string()),
            }
        )
