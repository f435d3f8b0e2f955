"""DuckDB oracle SQL for the SQL-parity ("simple") index-build variant.

The simple variant (``BuildConfig(tokenizer="simple")`` over
``sources.pages.simple_pages_dataset``) drives the REAL distributed build —
canonical docid sort, D1/D2 dedup groupbys, the groupby(term) posting
shuffle, varbyte encode — through inputs whose every byte is reproducible
in SQL.  These generators emit the DuckDB equivalents the driver runs
side-by-side (rows + schema + value hash).

Float policy: PageRank/HITS iterate in float64 on both sides with the SAME
literals/parenthesization, final values pass through the float32
quantization the pipeline stores (``lib/structs.py:58-67`` semantics), and
the compared columns are ``round(f32_as_double * 1e9)`` BIGINTs — both
sides round the *identical* f32 bits, so cross-engine summation-order
noise (~1e-15) cannot flip the comparison.

Shared constants: PageRank damping 0.85, 25 fixed iterations (the build
variant runs ``tol=0`` so early-break never fires — SQL can't express
"break before adopting" cheaply, fixed rounds can be unrolled); HITS with
the reference's out-link quirk (``lib/hits.py:34-37``); BM25 k1=1.2,
b=0.75 (params.py).
"""

from __future__ import annotations

from searchengine_ray import params

# common prelude: canonical docids, simple tokens, postings, doc lengths.
#
# ``base`` models BOTH dedup stages the distributed build runs over the
# simple corpus: D1 ((url, ts) — a no-op here, urls are unique per doc) and
# D2 (exact content hash, first-wins by canonical docid).  The D2 content
# key is the page payload byte-for-byte — raw text + NUL + newline-joined
# link urls (``sources.pages.simple_pages_dataset``) — so two documents
# with identical text AND identical link blocks collapse to the earlier
# docid exactly as the pipeline's dedup does.  The planted z.example.org
# duplicates need no modelling (the oracle never generates them), but
# ACCIDENTAL text duplicates in the driver's testdata do fire at sf0.1
# (doc_ids 932/4556 share text and both have doc_id%4==0 links), which a
# no-dedup oracle mis-scores — found by the sf0.1 scale-check, round 5.
_LINKS_ALL = (
    "lt AS (SELECT DISTINCT b.doc_id, "
    "((b.doc_id * 7 + CAST(j AS BIGINT) * 3 + 1) % "
    "(SELECT count(*) FROM documents)) AS tdoc "
    "FROM base_all b, UNNEST(generate_series(0, b.doc_id % 4 - 1)) u(j))"
)

_BASE = (
    "base_all AS (SELECT row_number() OVER (ORDER BY doc_id) AS docid, "
    "doc_id, COALESCE(text,'') AS rtext FROM documents), "
    f"{_LINKS_ALL}, "
    "lblock AS (SELECT doc_id, string_agg('https://s.example.org/' || "
    "lpad(CAST(tdoc AS VARCHAR), 8, '0'), chr(10) ORDER BY tdoc) AS ls "
    "FROM lt GROUP BY doc_id), "
    "base AS (SELECT b.docid, b.doc_id, lower(b.rtext) AS ltext "
    "FROM base_all b LEFT JOIN lblock l USING (doc_id) "
    "QUALIFY b.docid = min(b.docid) OVER ("
    "PARTITION BY b.rtext || chr(0) || COALESCE(l.ls, ''))), "
    "toks AS (SELECT docid, unnest(list_filter(regexp_split_to_array(ltext, "
    "'[^a-z0-9]+'), x -> x <> '')) AS term FROM base), "
    "post AS (SELECT term, docid, count(*) AS tf FROM toks GROUP BY term, docid), "
    "dl AS (SELECT b.docid, COALESCE(p.tt, 0) AS total_tokens, "
    "COALESCE(p.sdl, 0) AS doc_len FROM base b LEFT JOIN ("
    "SELECT docid, count(*) AS tt, CAST(sum(tf) AS BIGINT) AS sdl "
    "FROM post GROUP BY docid) p USING (docid))"
)

_URL = "'https://s.example.org/' || lpad(CAST(b.doc_id AS VARCHAR), 8, '0')"

# deterministic link rule (sources.pages.simple_link_targets) + resolution;
# src ranges over SURVIVORS (a D2-pruned page emits no edges) and dst
# resolution drops links to pruned urls (the url->docid LUT holds only
# survivors), both matching the pipeline
_EDGES = (
    "tgt AS (SELECT b.docid AS src, l.tdoc FROM base b JOIN lt l "
    "USING (doc_id)), "
    "edges AS (SELECT t.src, b2.docid AS dst FROM tgt t "
    "JOIN base b2 ON b2.doc_id = t.tdoc)"
)


def docs_sql() -> str:
    return (
        f"WITH {_BASE} "
        f"SELECT b.docid, {_URL} AS url, d.total_tokens, d.doc_len "
        "FROM base b JOIN dl d USING (docid)"
    )


def postings_sql() -> str:
    return (
        f"WITH {_BASE} "
        "SELECT term, docid, CAST(tf AS BIGINT) AS tf FROM post"
    )


def term_df_sql() -> str:
    return (
        f"WITH {_BASE} "
        "SELECT term, count(*) AS df FROM post GROUP BY term"
    )


def edges_sql() -> str:
    return f"WITH {_BASE}, {_EDGES} SELECT src, dst FROM edges"


def _pagerank_ctes(iters: int) -> str:
    """The unrolled PageRank CTE chain p0..p{iters} (reference formula
    ``new[d] = (1-0.85) + 0.85·Σ pr[u]/outdeg(u)``, ``lib/pagerank.py:40-43``;
    no 1/n teleport, dangling mass not redistributed)."""
    ctes = [
        "outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src)",
        "p0 AS MATERIALIZED (SELECT docid, 1.0 / (SELECT count(*) FROM base) AS r FROM base)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT b.docid, "
            "(1.0 - 0.85) + 0.85 * COALESCE(s.sm, 0.0) AS r "
            "FROM base b LEFT JOIN ("
            f"SELECT e.dst AS docid, sum(p.r / o.od) AS sm FROM p{i-1} p "
            "JOIN edges e ON e.src = p.docid JOIN outdeg o ON o.src = e.src "
            "GROUP BY e.dst) s USING (docid))"
        )
    return ", ".join(ctes)


def pagerank_sql(iters: int = params.PR_MAX_ITER) -> str:
    return (
        f"WITH {_BASE}, {_EDGES}, {_pagerank_ctes(iters)} "
        "SELECT docid, CAST(round(CAST(CAST(r AS FLOAT) AS DOUBLE) * 1000000000) "
        f"AS BIGINT) AS pr_e9 FROM p{iters}"
    )


def _hits_ctes(iters: int) -> str:
    """The unrolled HITS CTE chain h0..h{iters} with the reference's
    out-link quirk: BOTH hub and auth sum the previous auth/hub over a
    doc's OWN out-links (``lib/hits.py:34-37``), L2-normalized per
    iteration."""
    ctes = ["h0 AS MATERIALIZED (SELECT docid, 1.0 AS hub, 1.0 AS auth FROM base)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT b.docid, COALESCE(s.hsum, 0.0) AS hub_raw, "
            "COALESCE(s.asum, 0.0) AS auth_raw FROM base b LEFT JOIN ("
            f"SELECT e.src AS docid, sum(h.auth) AS hsum, sum(h.hub) AS asum "
            f"FROM h{i-1} h JOIN edges e ON e.dst = h.docid GROUP BY e.src) s "
            "USING (docid))"
        )
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT sqrt(sum(hub_raw * hub_raw)) AS hn, "
            f"sqrt(sum(auth_raw * auth_raw)) AS an FROM r{i})"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT docid, "
            f"CASE WHEN (SELECT hn FROM n{i}) > 0 "
            f"THEN hub_raw / (SELECT hn FROM n{i}) ELSE 0.0 END AS hub, "
            f"CASE WHEN (SELECT an FROM n{i}) > 0 "
            f"THEN auth_raw / (SELECT an FROM n{i}) ELSE 0.0 END AS auth "
            f"FROM r{i})"
        )
    return ", ".join(ctes)


def hits_sql(iters: int = params.HITS_MAX_ITER) -> str:
    return (
        f"WITH {_BASE}, {_EDGES}, {_hits_ctes(iters)} "
        "SELECT docid, "
        "CAST(round(CAST(CAST(hub AS FLOAT) AS DOUBLE) * 1000000000) AS BIGINT) "
        "AS hub_e9, "
        "CAST(round(CAST(CAST(auth AS FLOAT) AS DOUBLE) * 1000000000) AS BIGINT) "
        f"AS auth_e9 FROM h{iters}"
    )


def reference_scorer_sql(queries: list[str], k: int = 5) -> str:
    """The reference-exact scorer (``lib/queryproc.py:45-162`` semantics as
    implemented by ``QueryEngine.search``) over the simple index, in SQL:
    conjunctive intersection, intersected-df idf ``ln((1+N)/(1+C))`` (A5
    quirk), importance-bug 0.8 multiplier, cosine with the 0.4 gate,
    candidate-set L2 normalization of tfidf-sum / cosine / pr / hub / auth,
    and the 0.73/0.27 · 0.61/0.39 · 0.59/0.23/0.18 mixes — float64
    end-to-end with the same literals/parenthesization (derived constants
    written as ``(1.0 - x)`` exactly as params.py computes them).  Quality
    scores pass through the stored float32 (CAST AS FLOAT), matching what
    the engine reads back.  Zero-df query terms drop out exactly like the
    validation pass; queries must avoid the 174-word stopword list (the
    heap-readmission rule is not modelled).  Returns (qid, rank, docid),
    ranked net DESC, docid ASC, top-``k``."""
    from searchengine_ray.functions.tokenizer import simple_tokens

    vals = []
    for qid, q in enumerate(queries):
        counts: dict[str, int] = {}
        for t in simple_tokens(q):
            counts[t] = counts.get(t, 0) + 1
        for term, freq in counts.items():
            vals.append(f"({qid}, '{term}', {freq})")
    pr_iters = params.PR_MAX_ITER
    hits_iters = params.HITS_MAX_ITER
    return (
        f"WITH {_BASE}, {_EDGES}, {_pagerank_ctes(pr_iters)}, "
        f"{_hits_ctes(hits_iters)}, "
        "qpr AS (SELECT docid, CAST(CAST(r AS FLOAT) AS DOUBLE) AS pr "
        f"FROM p{pr_iters}), "
        "qha AS (SELECT docid, CAST(CAST(hub AS FLOAT) AS DOUBLE) AS hub, "
        f"CAST(CAST(auth AS FLOAT) AS DOUBLE) AS auth FROM h{hits_iters}), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base), "
        f"qraw(qid, term, freq) AS (VALUES {', '.join(vals)}), "
        # zero-df terms drop exactly like the validation pass
        "q AS (SELECT * FROM qraw WHERE term IN (SELECT term FROM post)), "
        "qn AS (SELECT qid, count(*) AS nt, CAST(sum(freq) AS DOUBLE) AS qtotal "
        "FROM q GROUP BY qid), "
        # conjunctive intersection (J3): docs containing ALL surviving terms
        "cand AS (SELECT q.qid, p.docid FROM q JOIN post p USING (term) "
        "JOIN qn ON qn.qid = q.qid GROUP BY q.qid, p.docid, qn.nt "
        "HAVING count(*) = qn.nt), "
        "csize AS (SELECT qid, CAST(count(*) AS BIGINT) AS c FROM cand "
        "GROUP BY qid), "
        # intersected-df idf quirk (A5): same idf for every term
        "qidf AS (SELECT qid, ln((1.0 + (SELECT n FROM nn)) / (1.0 + c)) AS idf "
        "FROM csize), "
        # tfidf = ((tf / total_tokens) * idf) * 0.8  (importance bug, M9)
        "tfidf AS (SELECT c.qid, c.docid, p.term, "
        "((CAST(p.tf AS DOUBLE) / d.total_tokens) * i.idf) * 0.8 AS w "
        "FROM cand c JOIN q ON q.qid = c.qid "
        "JOIN post p ON p.docid = c.docid AND p.term = q.term "
        "JOIN dl d ON d.docid = c.docid JOIN qidf i ON i.qid = c.qid), "
        "dsum AS (SELECT qid, docid, sum(w) AS s FROM tfidf GROUP BY qid, docid), "
        "qvec AS (SELECT q.qid, q.term, "
        "(CAST(q.freq AS DOUBLE) / qn.qtotal) * i.idf AS qw "
        "FROM q JOIN qn ON qn.qid = q.qid JOIN qidf i ON i.qid = q.qid), "
        "qnorm AS (SELECT qid, sqrt(sum(qw * qw)) AS qn FROM qvec GROUP BY qid), "
        "dnorm AS (SELECT qid, docid, sqrt(sum(w * w)) AS dn FROM tfidf "
        "GROUP BY qid, docid), "
        "dot AS (SELECT t.qid, t.docid, sum(t.w * v.qw) AS dp FROM tfidf t "
        "JOIN qvec v ON v.qid = t.qid AND v.term = t.term GROUP BY t.qid, t.docid), "
        "cosine AS (SELECT d.qid, d.docid, CASE WHEN dn.dn * q.qn > 0 "
        "THEN d.dp / (dn.dn * q.qn) ELSE 0.0 END AS cos FROM dot d "
        "JOIN dnorm dn ON dn.qid = d.qid AND dn.docid = d.docid "
        "JOIN qnorm q ON q.qid = d.qid), "
        "snorm AS (SELECT qid, sqrt(sum(s * s)) AS sn FROM dsum GROUP BY qid), "
        "cnorm AS (SELECT qid, sqrt(sum(cos * cos)) AS cn FROM cosine "
        "GROUP BY qid), "
        "prn AS (SELECT c.qid, sqrt(sum(p.pr * p.pr)) AS v FROM cand c "
        "JOIN qpr p ON p.docid = c.docid GROUP BY c.qid), "
        "hn AS (SELECT c.qid, sqrt(sum(h.hub * h.hub)) AS v FROM cand c "
        "JOIN qha h ON h.docid = c.docid GROUP BY c.qid), "
        "an AS (SELECT c.qid, sqrt(sum(h.auth * h.auth)) AS v FROM cand c "
        "JOIN qha h ON h.docid = c.docid GROUP BY c.qid), "
        "scored AS (SELECT c.qid, c.docid, "
        "0.61 * (CASE WHEN co.cos > 0.4 THEN "
        "0.73 * (CASE WHEN sn.sn > 0 THEN ds.s / sn.sn ELSE 0.0 END) + "
        "(1.0 - 0.73) * (CASE WHEN cn.cn > 0 THEN co.cos / cn.cn ELSE 0.0 END) "
        "ELSE 0.0 END) + (1.0 - 0.61) * ("
        "0.59 * (CASE WHEN prn.v > 0 THEN p.pr / prn.v ELSE 0.0 END) + "
        "0.23 * (CASE WHEN hn.v > 0 THEN h.hub / hn.v ELSE 0.0 END) + "
        "0.18 * (CASE WHEN an.v > 0 THEN h.auth / an.v ELSE 0.0 END)) AS net "
        "FROM cand c "
        "JOIN dsum ds ON ds.qid = c.qid AND ds.docid = c.docid "
        "JOIN cosine co ON co.qid = c.qid AND co.docid = c.docid "
        "JOIN snorm sn ON sn.qid = c.qid JOIN cnorm cn ON cn.qid = c.qid "
        "JOIN qpr p ON p.docid = c.docid JOIN qha h ON h.docid = c.docid "
        "JOIN prn ON prn.qid = c.qid JOIN hn ON hn.qid = c.qid "
        "JOIN an ON an.qid = c.qid) "
        # rank on the 1e-9-quantized score: the candidate-normalized mix
        # produces near-exact ties (word-soup docs with identical tf
        # structure) whose f64 ordering depends on summation order — the
        # quantization makes the comparison deterministic on both sides
        # (the Ray entry ranks on the same np.round(net, 9))
        "SELECT qid, docid, rank FROM (SELECT qid, docid, row_number() OVER ("
        "PARTITION BY qid ORDER BY round(net, 9) DESC, docid ASC) AS rank "
        f"FROM scored) WHERE rank <= {k}"
    )


def legacy_scorer_sql(queries: list[str], k: int = 5) -> str:
    """The legacy max-norm scorer (``lib/process_query.py:154-201``
    semantics as implemented by ``QueryEngine.search_legacy``, SURVEY §2
    A9) over the simple index, in SQL: conjunctive intersection, full-df
    idf ``log2((N+1)/(df+1))`` (not the live scorer's intersected-df
    quirk), query tf computed IN SQL as the substring count of the term
    in the raw query string (the ``query.count(word)`` quirk —
    ``(length(q)-length(replace(q,term,'')))/length(term)`` counts the
    same non-overlapping occurrences), ``1+ln(tf)`` doc weights, per-doc
    L2 cosine, and quality = pr/max + hub/max + auth/max + cosine with
    maxes over the intersection candidates.  The 1.2 important-tag
    promotion is identity here: the simple corpus stores importance 0 on
    every posting (plain-text payload + the replicated importance bug),
    so the SQL omits it — the branch is pytest-covered on an
    importance_bug=False reference-mode index.  Queries must be lowercase
    (the engine counts substrings of the lowercase term in the RAW query)
    and must keep at least one term with a nonzero substring count (an
    all-zero query vector returns [] — reference raises).  Returns
    (qid, docid, rank) ranked round(net,9) DESC, docid ASC, top-``k``."""
    from searchengine_ray.functions.tokenizer import is_stopword, simple_tokens

    qvals, tvals = [], []
    for qid, q in enumerate(queries):
        qvals.append(f"({qid}, '{q}')")
        seen: set[str] = set()
        for t in simple_tokens(q):
            if is_stopword(t) or t in seen:
                continue
            seen.add(t)
            tvals.append(f"({qid}, '{t}')")
    pr_iters = params.PR_MAX_ITER
    hits_iters = params.HITS_MAX_ITER
    return (
        f"WITH {_BASE}, {_EDGES}, {_pagerank_ctes(pr_iters)}, "
        f"{_hits_ctes(hits_iters)}, "
        "qpr AS (SELECT docid, CAST(CAST(r AS FLOAT) AS DOUBLE) AS pr "
        f"FROM p{pr_iters}), "
        "qha AS (SELECT docid, CAST(CAST(hub AS FLOAT) AS DOUBLE) AS hub, "
        f"CAST(CAST(auth AS FLOAT) AS DOUBLE) AS auth FROM h{hits_iters}), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base), "
        f"qstr(qid, qs) AS (VALUES {', '.join(qvals)}), "
        f"qraw(qid, term) AS (VALUES {', '.join(tvals)}), "
        # zero-df terms contribute neither a doc set nor a query weight
        "q AS (SELECT * FROM qraw WHERE term IN (SELECT term FROM post)), "
        "qn AS (SELECT qid, count(*) AS nt FROM q GROUP BY qid), "
        # conjunctive intersection: docs containing ALL surviving terms
        "cand AS (SELECT q.qid, p.docid FROM q JOIN post p USING (term) "
        "JOIN qn ON qn.qid = q.qid GROUP BY q.qid, p.docid, qn.nt "
        "HAVING count(*) = qn.nt), "
        "tdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post "
        "GROUP BY term), "
        # full-df idf + the substring-count query tf, both per (qid, term)
        "qv AS (SELECT q.qid, q.term, "
        "log2((1.0 + (SELECT n FROM nn)) / (1.0 + t.df)) AS idf, "
        "(length(s.qs) - length(replace(s.qs, q.term, ''))) "
        "/ length(q.term) AS qtf "
        "FROM q JOIN tdf t USING (term) JOIN qstr s ON s.qid = q.qid), "
        "qw AS (SELECT qid, term, CASE WHEN qtf > 0 "
        "THEN (1.0 + ln(CAST(qtf AS DOUBLE))) * idf ELSE 0.0 END AS qw "
        "FROM qv), "
        "qlen AS (SELECT qid, sqrt(sum(qw * qw)) AS ql FROM qw GROUP BY qid), "
        # doc weights: 1+ln(tf); importance identity (all-0, see docstring)
        "dw AS (SELECT c.qid, c.docid, p.term, "
        "1.0 + ln(CAST(p.tf AS DOUBLE)) AS w "
        "FROM cand c JOIN q ON q.qid = c.qid "
        "JOIN post p ON p.docid = c.docid AND p.term = q.term), "
        "dlen AS (SELECT qid, docid, sqrt(sum(w * w)) AS dn FROM dw "
        "GROUP BY qid, docid), "
        "cosine AS (SELECT d.qid, d.docid, "
        "sum((d.w / dl.dn) * (v.qw / ql.ql)) AS cos FROM dw d "
        "JOIN dlen dl ON dl.qid = d.qid AND dl.docid = d.docid "
        "JOIN qw v ON v.qid = d.qid AND v.term = d.term "
        "JOIN qlen ql ON ql.qid = d.qid GROUP BY d.qid, d.docid), "
        # max-norm quality over the intersection candidates
        "mx AS (SELECT c.qid, max(p.pr) AS mpr, max(h.hub) AS mhub, "
        "max(h.auth) AS mauth FROM cand c "
        "JOIN qpr p ON p.docid = c.docid "
        "JOIN qha h ON h.docid = c.docid GROUP BY c.qid), "
        "scored AS (SELECT c.qid, c.docid, "
        "(CASE WHEN m.mpr > 0 THEN p.pr / m.mpr ELSE 0.0 END) + "
        "(CASE WHEN m.mhub > 0 THEN h.hub / m.mhub ELSE 0.0 END) + "
        "(CASE WHEN m.mauth > 0 THEN h.auth / m.mauth ELSE 0.0 END) + "
        "co.cos AS net FROM cand c "
        "JOIN cosine co ON co.qid = c.qid AND co.docid = c.docid "
        "JOIN qpr p ON p.docid = c.docid JOIN qha h ON h.docid = c.docid "
        "JOIN mx m ON m.qid = c.qid) "
        "SELECT qid, docid, rank FROM (SELECT qid, docid, row_number() OVER ("
        "PARTITION BY qid ORDER BY round(net, 9) DESC, docid ASC) AS rank "
        f"FROM scored) WHERE rank <= {k}"
    )


def bm25_sql(queries: list[str], k: int = 10) -> str:
    """Disjunctive BM25 top-k over the simple index — the exact
    ``QueryEngine.search_bm25`` formula (k1/b from params.py, global-df
    idf), ranked (score DESC, docid ASC), ints only."""
    from searchengine_ray.functions.tokenizer import simple_tokens

    k1, b = params.BM25_K1, params.BM25_B
    vals = []
    for qid, q in enumerate(queries):
        for term in sorted(set(simple_tokens(q))):
            vals.append(f"({qid}, '{term}')")
    if not vals:
        vals.append("(0, '')")
    return (
        f"WITH {_BASE}, "
        "stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(doc_len) AS avgdl "
        "FROM dl), "
        "tdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post "
        "GROUP BY term), "
        f"q(qid, term) AS (VALUES {', '.join(vals)}), "
        "scores AS (SELECT q.qid, p.docid, "
        f"sum(ln(1.0 + ((SELECT n FROM stats) - t.df + 0.5) / (t.df + 0.5)) "
        f"* p.tf * ({k1!r} + 1.0) / (p.tf + {k1!r} * (1.0 - {b!r} + {b!r} "
        "* d.doc_len / (SELECT avgdl FROM stats)))) AS score "
        "FROM q JOIN post p ON p.term = q.term JOIN tdf t ON t.term = q.term "
        "JOIN dl d ON d.docid = p.docid GROUP BY q.qid, p.docid) "
        "SELECT qid, docid, rank FROM (SELECT qid, docid, row_number() OVER ("
        "PARTITION BY qid ORDER BY score DESC, docid ASC) AS rank FROM scores) "
        f"WHERE rank <= {k}"
    )
