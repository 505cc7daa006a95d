#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare: for each query
dumped by graft.Verify, run its oracle SQL in DuckDB over the same
parquet tables and diff row count, sorted-column schema, and value hash.
Usage: compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).find("ndarray") >= 0 else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.9g")
                       .encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            results[name] = f"ROWCOUNT {len(a)} vs {len(b)}"
        elif list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
        elif h(a) != h(b):
            diff = None
            for c in a.columns:
                if not a[c].equals(b[c]):
                    try:
                        mism = (a[c] != b[c])
                        idx = mism[mism].index[:3].tolist()
                        diff = (c, [(a[c][i], b[c][i]) for i in idx])
                    except Exception:
                        diff = (c, "uncomparable")
                    break
            results[name] = f"HASH_MISMATCH {diff}"
        else:
            results[name] = f"OK rows={len(a)}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{k:28s} {v}")
    print(f"-- {ok}/{len(results)} OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
