#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name>/ parquet (Spark result), runs
<outDir>/oracle_sql.json[name] in DuckDB against <sfDir>/*.parquet views,
sorts columns by name + rows, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    failed = []
    for name in names:
        # Read the Spark side with pandas (as the driver does): decimal
        # columns surface as Decimal objects ('493670.20'), NOT float64 —
        # reading via DuckDB would coerce both sides to float64 and mask
        # Decimal-vs-float mismatches the driver detects.
        got = pd.concat(
            [pd.read_parquet(p) for p in
             sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))],
            ignore_index=True)
        if name not in oracle:
            status = f"rows-only rows={len(got)}"
            if len(got) == 0:
                status += " (EMPTY!)"
                failed.append(name)
            print(f"{name:24s} {status}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERROR {e}")
            failed.append(name)
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:24s} COLS got={list(g.columns)} exp={list(e.columns)}")
            failed.append(name)
            continue
        if len(g) != len(e):
            print(f"{name:24s} ROWS got={len(g)} exp={len(e)}")
            failed.append(name)
            continue
        gs = g.astype(str)
        es = e.astype(str)
        if not gs.equals(es):
            diff = (gs != es).any(axis=1)
            print(f"{name:24s} VALUES {int(diff.sum())}/{len(g)} rows differ")
            print("  got:", gs[diff].head(3).to_dict("records"))
            print("  exp:", es[diff].head(3).to_dict("records"))
            failed.append(name)
            continue
        print(f"{name:24s} OK rows={len(g)}")
    print(f"\n{len(names)-len(failed)}/{len(names)} pass")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
