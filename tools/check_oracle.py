#!/usr/bin/env python
"""Local stand-in for the driver's correctness harness: run each
queries() entry and, where an oracle_sql() entry exists, compare
row-count / schema / order-insensitive values against DuckDB.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    try:
        import ray
        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    assert isinstance(res, pd.DataFrame), type(res)
    return res


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import duckdb
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = m.queries()
    oracles = m.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(res)} cols={list(res.columns)} "
                  f"[rows-only] {dt:.1f}s")
            continue
        try:
            ora = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            # an oracle-side error is a FAILURE of the suite (the SQL
            # must run at every SF), but must not kill the whole sweep
            print(f"FAIL {name}: ORACLE raised {type(e).__name__}: {e}")
            failures += 1
            continue
        a, b = canon(res), canon(ora)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} != {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"schema {list(a.columns)} != {list(b.columns)}")
        if not status:
            import pandas as pd
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                status.append(f"values differ: {str(e)[:300]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(res)} oracle-match {dt:.1f}s")
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
