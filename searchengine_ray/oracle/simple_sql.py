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

# common prelude: canonical docids, simple tokens, postings, doc lengths
_BASE = (
    "base AS (SELECT row_number() OVER (ORDER BY doc_id) AS docid, doc_id, "
    "lower(COALESCE(text,'')) AS ltext FROM documents), "
    "toks AS (SELECT docid, unnest(list_filter(regexp_split_to_array(ltext, "
    "'[^a-z0-9]+'), x -> x <> '')) AS term FROM base), "
    "post AS (SELECT term, docid, count(*) AS tf FROM toks GROUP BY term, docid), "
    "dl AS (SELECT b.docid, COALESCE(p.tt, 0) AS total_tokens, "
    "COALESCE(p.sdl, 0) AS doc_len FROM base b LEFT JOIN ("
    "SELECT docid, count(*) AS tt, CAST(sum(tf) AS BIGINT) AS sdl "
    "FROM post GROUP BY docid) p USING (docid))"
)

_URL = "'https://s.example.org/' || lpad(CAST(b.doc_id AS VARCHAR), 8, '0')"

# deterministic link rule (sources.pages.simple_link_targets) + resolution
_EDGES = (
    "tgt AS (SELECT DISTINCT b.docid AS src, "
    "((b.doc_id * 7 + CAST(j AS BIGINT) * 3 + 1) % "
    "(SELECT count(*) FROM documents)) AS tdoc "
    "FROM base b, UNNEST(generate_series(0, b.doc_id % 4 - 1)) u(j)), "
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


def pagerank_sql(iters: int = params.PR_MAX_ITER) -> str:
    """Unrolled fixed-iteration PageRank with the reference formula
    ``new[d] = (1-0.85) + 0.85·Σ pr[u]/outdeg(u)`` (``lib/pagerank.py:40-43``;
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
    return (
        f"WITH {_BASE}, {_EDGES}, {', '.join(ctes)} "
        "SELECT docid, CAST(round(CAST(CAST(r AS FLOAT) AS DOUBLE) * 1000000000) "
        f"AS BIGINT) AS pr_e9 FROM p{iters}"
    )


def hits_sql(iters: int = params.HITS_MAX_ITER) -> str:
    """Unrolled fixed-iteration HITS with the reference's out-link quirk:
    BOTH hub and auth sum the previous auth/hub over a doc's OWN out-links
    (``lib/hits.py:34-37``), L2-normalized per iteration."""
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
    return (
        f"WITH {_BASE}, {_EDGES}, {', '.join(ctes)} "
        "SELECT docid, "
        "CAST(round(CAST(CAST(hub AS FLOAT) AS DOUBLE) * 1000000000) AS BIGINT) "
        "AS hub_e9, "
        "CAST(round(CAST(CAST(auth AS FLOAT) AS DOUBLE) * 1000000000) AS BIGINT) "
        f"AS auth_e9 FROM h{iters}"
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
