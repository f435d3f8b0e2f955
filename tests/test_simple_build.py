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
