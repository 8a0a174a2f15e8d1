"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf_dir, compares row count, column names, and
(order-insensitive) values.  Usage::

    python scripts/check_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64").round(9)
        elif str(out[c].dtype).startswith("decimal") or out[c].dtype == object:
            try:
                out[c] = pd.to_numeric(out[c])
                out[c] = (
                    out[c].astype("int64")
                    if out[c].dtype.kind in "iu"
                    else out[c].astype("float64").round(9)
                )
            except (ValueError, TypeError):
                out[c] = out[c].astype(str)
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from bilies_go_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) {time.time()-t0:.1f}s")
            if len(got) == 0:
                print(f"     WARN {name}: zero rows")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        if len(got) != len(want):
            status.append(f"rows spark={len(got)} duck={len(want)}")
        if not status and list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
            status.append(f"dtypes spark={list(map(str, got.dtypes))} duck={list(map(str, want.dtypes))}")
        if not status:
            if got.equals(want):
                pass
            else:
                neq = ~(got.eq(want) | (got.isna() & want.isna()))
                bad = neq.any(axis=1)
                status.append(f"{int(bad.sum())} differing rows")
                merged = pd.concat(
                    [got[bad].head(4).add_suffix("_spark"), want[bad].head(4).add_suffix("_duck")],
                    axis=1,
                )
                status.append("\n" + merged.to_string())
        if status:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            print(f"ok   {name}: rows={len(got)} match {time.time()-t0:.1f}s")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
