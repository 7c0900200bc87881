"""Mimics the driver's correctness gate: runs every __spark_entry__.queries()
entry at sf0.01 and compares against oracle_sql() via DuckDB —
row count + column names + order-insensitive values (sorted by all columns).

Usage: python tools/selfcheck.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from pysearchlite_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"rows {len(got)} != {len(want)}")
        return errs
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating) or \
                np.issubdtype(np.asarray(wv).dtype, np.floating):
            ok = np.allclose(np.asarray(gv, float), np.asarray(wv, float),
                             rtol=0, atol=1e-12, equal_nan=True)
        else:
            ok = (pd.Series(gv).astype(str) == pd.Series(wv).astype(str)).all()
        if not ok:
            bad = np.flatnonzero(pd.Series(gv).astype(str).to_numpy()
                                 != pd.Series(wv).astype(str).to_numpy())[:3]
            errs.append(f"col {c} differs at rows {bad.tolist()}: "
                        f"got {[gv[i] for i in bad]} want {[wv[i] for i in bad]}")
    return errs


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    qs, osql = E.queries(), E.oracle_sql()
    # driver-contract window: the driver oracle-checks only the first 50
    # queries() entries — anything past that silently gets no CORRECTNESS
    # row (round-4 lesson: 14 entries fell out of the window)
    assert len(qs) <= 50, (
        f"queries() has {len(qs)} entries but the driver checks only the "
        f"first 50 — consolidate or rotate: {list(qs)[50:]}")
    if len(sys.argv) > 2:          # optional comma-list of keys to check
        keep = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in keep}
    fails = 0
    for name, fn in qs.items():
        try:
            got = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            fails += 1
            continue
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(got)} rows, "
                  f"cols {list(got.columns)}")
            continue
        try:
            want = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            fails += 1
            continue
        errs = compare(name, got, want)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    # smoke entry()
    try:
        n = E.entry(spark).count()
        print(f"entry(): {n} rows")
    except Exception as ex:
        print(f"FAIL entry(): {ex}")
        fails += 1
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
