"""Driver-style correctness sweep: run EVERY ``__ray_entry__.queries()``
entry and its ``oracle_sql()`` twin over the same parquet tables and
compare column names, row count, and order-insensitive values (floats to
1e-9) — the same gate ``tests/test_oracle_parity.py`` applies at sf0.001,
runnable standalone at any scale factor.

Usage:  python tools/sweep_oracle.py [sf_dir] [query ...]
        (defaults: /root/testdata/sf0.01, all queries)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer) or df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    q, o = e.queries(), e.oracle_sql()
    names = sys.argv[2:] or sorted(q)
    fails, n_ok, n_rows_only = [], 0, 0
    for name in names:
        t0 = time.time()
        try:
            res = q[name](sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if name not in o:
                n_rows_only += 1
                print(f"{name}: rows_only {len(df)} ({time.time() - t0:.1f}s)", flush=True)
                continue
            a, b = _norm(df), _norm(con.sql(o[name]).df())
            bad: list[str] = []
            if list(a.columns) != list(b.columns):
                bad.append(f"cols {list(a.columns)} vs {list(b.columns)}")
            elif len(a) != len(b):
                bad.append(f"rows {len(a)} vs {len(b)}")
            else:
                for c in a.columns:
                    av, bv = a[c].to_numpy(), b[c].to_numpy()
                    if np.issubdtype(a[c].dtype, np.floating):
                        if not np.allclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True):
                            bad.append(c)
                    elif (av != bv).sum():
                        bad.append(c)
            if bad:
                fails.append((name, bad))
                print(f"{name}: FAIL {bad} ({time.time() - t0:.1f}s)", flush=True)
            else:
                n_ok += 1
                print(f"{name}: ok {len(a)} rows ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 — sweep must survive one bad query
            fails.append((name, repr(ex)[:200]))
            print(f"{name}: ERROR {ex!r}"[:300], flush=True)
    print(f"SWEEP DONE ok: {n_ok} rows_only: {n_rows_only} fail: {len(fails)}", flush=True)
    for f in fails:
        print("  FAIL:", f, flush=True)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
