"""SQL-parity build variant: the REAL distributed pipeline (docid sort,
dedup groupbys, posting shuffle, varbyte encode/decode, 25-round
PageRank/HITS, BM25 top-k) hash-checked against DuckDB end-to-end — the
pytest mirror of the driver's CORRECTNESS gate for the
``index_simple_*`` / ``search_simple_bm25`` entries."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

SIMPLE_ENTRIES = [
    "index_simple_docs",
    "index_simple_postings",
    "index_simple_term_df",
    "index_simple_edges",
    "index_simple_pagerank",
    "index_simple_hits",
    "search_simple_bm25",
    "search_simple_reference",
]


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SIMPLE_ENTRIES)
def test_simple_build_sql_parity(entry, con, name):
    got = _canon(entry.queries()[name](SF).to_pandas())
    want = _canon(con.execute(entry.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_simple_index_roundtrips_varbyte(entry, ray_session):
    """The postings entry decodes what the build encoded — df in the
    segment row equals the decoded posting count per term."""
    import ray.data

    r = entry._build_simple_index(SF)
    seg = ray.data.read_parquet(r.segments_dir).select_columns(["term", "df"])
    df_by_term = {row["term"]: row["df"] for row in seg.take_all()}
    decoded = entry.queries()["index_simple_postings"](SF).to_pandas()
    counts = decoded.groupby("term")["docid"].count()
    assert counts.to_dict() == df_by_term


def test_simple_build_dedups_accidental_text_dups(entry, ray_session, tmp_path):
    """D2 content dedup fires on ACCIDENTAL duplicate texts (not just the
    planted z-pages) and the oracle SQL models it: two docs with identical
    text and identical (empty) link blocks collapse to the earlier docid,
    while identical text with DIFFERENT link blocks keeps both.  Found by
    the round-5 sf0.1 scale-check (doc_ids 932/4556)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # doc_id % 4 == 0 -> no links (payloads identical for equal text);
    # doc_id 1 vs 5: same text, one link each to DIFFERENT targets
    # ((1*7+1)%8 = 0 vs (5*7+1)%8 = 4) -> payloads differ, both kept
    rows = [
        (0, "alpha beta gamma", "en"),
        (4, "alpha beta gamma", "en"),   # dup of 0: must be pruned
        (8, "delta epsilon", "en"),
        (12, "alpha beta gamma", "en"),  # dup of 0: must be pruned
        (1, "zeta eta theta", "en"),
        (5, "zeta eta theta", "en"),     # same text, different link -> kept
        (6, "iota kappa", "en"),
        (7, "lambda mu", "en"),
    ]
    sf = tmp_path / "sfdup"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for name in ["index_simple_docs", "index_simple_edges", "index_simple_postings"]:
        got = _canon(entry.queries()[name](str(sf)).to_pandas())
        want = _canon(con2.execute(entry.oracle_sql()[name]).fetchdf())
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name
    docs = entry.queries()["index_simple_docs"](str(sf)).to_pandas()
    # docids are row_number over doc_id BEFORE the prune: sorted doc_ids
    # (0,1,4,5,6,7,8,12) -> docids 1..8; doc 4 (docid 3) and doc 12
    # (docid 8) pruned as content dups of doc 0; docs 1/5 (docids 2/4,
    # same text, different links) both survive
    assert sorted(docs["docid"]) == [1, 2, 4, 5, 6, 7]
