import sys, time
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E
import duckdb, pandas as pd, numpy as np
import pyarrow as pa

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents","embeddings","events","lineitem","orders","customer"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def to_pandas(x):
    import ray.data as rd
    if isinstance(x, rd.Dataset): return x.to_pandas()
    if isinstance(x, pa.Table): return x.to_pandas()
    return x

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, tuple)) or str(df[c].dtype) == 'object' and len(df) and hasattr(df[c].iloc[0], '__len__') and not isinstance(df[c].iloc[0], str):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

qs = E.queries()
osql = E.oracle_sql()
only = sys.argv[1:] or list(qs)
for name in only:
    fn = qs[name]
    t0 = time.perf_counter()
    try:
        got = canon(to_pandas(fn(sf)))
    except Exception as e:
        print(f"{name}: RAY FAIL {type(e).__name__}: {e}"); continue
    dt = time.perf_counter() - t0
    if name in osql:
        want = canon(con.execute(osql[name]).fetchdf())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0]
        print(f"{name}: rows={len(got)}/{len(want)} cols={ok_cols} vals={ok_vals} ({dt:.1f}s)" + ("" if ok_vals else f"  <-- {msg if not ok_vals and ok_rows and ok_cols else 'shape'}"))
    else:
        print(f"{name}: rows-only rows={len(got)} ({dt:.1f}s)")
ray.shutdown()
