"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from ontology_pipeline_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").map(
                lambda v: v.isoformat() if pd.notna(v) else None
            )
        elif "float" in str(df[c].dtype):
            # round BEFORE sorting: sub-tolerance float differences must not
            # reorder the two frames against each other (a misaligned sort
            # would then zip row A against row B and report false mismatches)
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) < 1e-9 or a == b
    return a == b


def _dtype_family(dt) -> str:
    s = str(dt)
    if "int" in s:
        return "int"
    if "float" in s or "decimal" in s.lower():
        return "float"
    if "datetime" in s:
        return "ts"
    return "str"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    for col in sdf.columns:
        fa, fb = _dtype_family(sdf[col].dtype), _dtype_family(odf[col].dtype)
        if fa != fb:
            errs.append(f"dtype {col}: spark={sdf[col].dtype} oracle={odf[col].dtype}")
    if errs:
        return errs
    if len(sdf) != len(odf):
        errs.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
        return errs
    s, o = normalize(sdf), normalize(odf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov))
            if not (values_equal(x, y) or (pd.isna(x) and pd.isna(y)))
        ]
        if bad:
            errs.append(f"col {col}: {len(bad)} mismatches, first: {bad[0]}")
    return errs


def main():
    # default to sf0.01 — the scale the DRIVER runs its correctness gate at
    # (checking at a smaller sf once masked a real boundary-semantics
    # mismatch in user_sessions that only manifested at sf0.01)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="contract-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows")

    # entry() smoke
    e = entrymod.entry(spark)
    print(f"entry(): {e.count()} rows, schema={e.schema.simpleString()}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
