"""Dev harness (not collected by pytest): run every registered query against
its DuckDB oracle at a given sf dir and print per-query match status —
the local stand-in for the driver's CORRECTNESS matrix.

Usage: python tests/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, sqls = e.queries(), e.oracle_sql()
    names = ONLY or list(qs)
    fails = []
    for name in names:
        try:
            res = qs[name](SF)
            got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if name not in sqls:
                print(f"{name:28s} rows={len(got)} (no oracle)")
                continue
            exp = con.sql(sqls[name]).df()
            try:
                pd.testing.assert_frame_equal(_norm(got), _norm(exp))
                print(f"{name:28s} OK rows={len(got)}")
            except AssertionError as ex:
                fails.append(name)
                print(f"{name:28s} MISMATCH rows={len(got)} vs {len(exp)}")
                print(str(ex)[:500])
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:300]}")
    print("FAILS:", fails)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
