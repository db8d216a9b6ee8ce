"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() side-by-side over an sf dir and
compare row count, schema (column names), and order-insensitive values.

Usage: python tools/crosscheck.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])  # optional: restrict to these query names
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("CROSSCHECK_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = sqls.get(name)
        try:
            got = to_pandas(fn(sf_dir))
            if sql is not None:
                got = canon(got)
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        # dtype-strict first (the driver hashes raw values, so an int64-vs-
        # float64 divergence that passes a tolerant compare is still a
        # hash-mismatch for the driver — surface it here).
        dtype_warn = [
            c for c in got.columns
            if got[c].dtype.kind != exp[c].dtype.kind
        ]
        if dtype_warn:
            print(
                f"[FAIL] {name}: dtype-kind mismatch in {dtype_warn}: "
                f"ray={[str(got[c].dtype) for c in dtype_warn]} "
                f"oracle={[str(exp[c].dtype) for c in dtype_warn]}"
            )
            failures += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                if not np.allclose(
                    a.astype(float), b.astype(float), rtol=0, atol=1e-9,
                    equal_nan=True,
                ):
                    ok = False
            elif not a.astype(str).equals(b.astype(str)):
                ok = False
            if not ok:
                break
        if ok:
            print(f"[ok] {name}: {len(got)} rows match")
        else:
            print(f"[FAIL] {name}: value mismatch in column {c}")
            mism = (got[c].astype(str) != exp[c].astype(str))
            print(got[mism].head(3))
            print(exp[mism].head(3))
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
