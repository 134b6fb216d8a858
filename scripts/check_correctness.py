"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF, compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, values stringified with float canonicalization).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark

    spark = get_spark(EngineConfig())

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = ent.queries(), ent.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        cs, co = canon(sdf), canon(odf)
        ok_rows = len(cs) == len(co)
        ok_cols = list(cs.columns) == list(co.columns)
        hs, ho = value_hash(cs), value_hash(co)
        ok = ok_rows and ok_cols and hs == ho
        status = "OK  " if ok else "FAIL"
        print(
            f"{status}  {name}: spark={len(cs)} duck={len(co)} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if hs == ho else 'DIFF'} "
            f"[{time.time()-t0:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if ok_cols and ok_rows:
                for c in cs.columns:
                    a, b = cs[c], co[c]
                    try:
                        same = (
                            a.equals(b)
                            or bool(
                                np.allclose(
                                    pd.to_numeric(a, errors="coerce").fillna(-9e9),
                                    pd.to_numeric(b, errors="coerce").fillna(-9e9),
                                )
                            )
                        )
                    except Exception:
                        same = a.equals(b)
                    if not same:
                        bad = (a.astype(str) != b.astype(str))
                        i = bad.idxmax()
                        print(f"        col {c}: first diff row {i}: "
                              f"spark={a[i]!r} duck={b[i]!r} ({int(bad.sum())} rows)")
            else:
                print(f"        cols spark={list(cs.columns)}")
                print(f"        cols duck ={list(co.columns)}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
