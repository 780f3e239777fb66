"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet
tables, and compares row count + order-insensitive values (columns
sorted by name).  Usage::

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.where(s.notna(), None)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> str:
    sp = canon(spark_df.toPandas())
    orc = canon(oracle_df)
    if list(sp.columns) != list(orc.columns):
        return f"SCHEMA MISMATCH spark={list(sp.columns)} oracle={list(orc.columns)}"
    if len(sp) != len(orc):
        return f"ROWCOUNT MISMATCH spark={len(sp)} oracle={len(orc)}"
    if not sp.equals(orc):
        neq = (sp != orc) & ~(sp.isna() & orc.isna())
        bad = neq.any(axis=1)
        n_bad = int(bad.sum())
        sample_ix = sp.index[bad][:3]
        detail = []
        for i in sample_ix:
            cols = [c for c in sp.columns if bool(neq.loc[i, c])]
            detail.append(
                {c: (sp.loc[i, c], orc.loc[i, c]) for c in cols}
            )
        return f"VALUE MISMATCH rows={n_bad} sample={detail}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from aqueduct_core_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duck_con(sf_dir)
    qs, os_ = e.queries(), e.oracle_sql()

    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in os_:
                orc = con.execute(os_[name]).fetchdf()
                verdict = compare(name, df, orc)
            else:
                n = df.count()
                verdict = f"rows-only ({n} rows)" if n >= 0 else "EMPTY"
        except Exception as ex:  # noqa: BLE001
            verdict = f"ERROR {type(ex).__name__}: {ex}"
        dt = time.time() - t0
        status = "ok" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {name:28s} {dt:6.1f}s  {verdict[:400]}")

    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
