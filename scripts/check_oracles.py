"""Local stand-in for the driver's CORRECTNESS gate: run every
``__ray_entry__.queries()`` entry at a given sf and compare rows / schema /
values against ``oracle_sql()`` via DuckDB.

    python scripts/check_oracles.py [sf_dir] [entry ...]

Entries without an oracle are reported as rows-only (row count printed).
"""

from __future__ import annotations

import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def _canon(df):
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')"
        )

    queries = entry.queries()
    sqls = entry.oracle_sql()
    bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            raw = _to_pandas(fn(sf))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR running query: {exc!r}")
            bad += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"{name:28s} rows={len(raw):>7} (no oracle) [{dt:.1f}s]")
            continue
        got = _canon(raw)
        try:
            want = _canon(con.execute(sqls[name]).df())
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR in oracle SQL: {exc!r}")
            bad += 1
            continue
        rows_ok = len(got) == len(want)
        schema_ok = list(got.columns) == list(want.columns)
        val_ok = False
        if rows_ok and schema_ok:
            try:
                import pandas.testing as pdt

                pdt.assert_frame_equal(got, want, check_dtype=False)
                val_ok = True
            except AssertionError as exc:
                val_ok = False
                detail = str(exc).splitlines()[0]
        status = "OK" if (rows_ok and schema_ok and val_ok) else "MISMATCH"
        schema_msg = (
            "ok" if schema_ok else f"{list(got.columns)}!={list(want.columns)}"
        )
        print(
            f"{name:28s} {status}  rows={len(got)}/{len(want)} "
            f"schema={schema_msg} values={'ok' if val_ok else 'DIFF'} [{dt:.1f}s]"
        )
        if status != "OK":
            bad += 1
            if rows_ok and schema_ok and not val_ok:
                print("   ", detail)
            print("    got :", got.head(3).to_dict("records"))
            print("    want:", want.head(3).to_dict("records"))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
