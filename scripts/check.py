#!/usr/bin/env python3
"""Driver-mimicking correctness check (local dev loop only).

Reads Verify.scala output (<outDir>/<name>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf dir, and compares:
columns sorted by name, rows sorted, values hashed. Mirrors the driver's
CORRECTNESS gate so we catch mismatches before a round ends.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, os, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v)) + ".0"
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)

def frame_key(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a query that threw during the dump must fail the gate loudly, not
    # silently vanish from the result dirs (queries.json is Verify's
    # per-query outcome manifest; older dumps may not have one)
    mpath = f"{out_dir}/queries.json"
    if os.path.exists(mpath):
        manifest = json.load(open(mpath))
        for name, st in sorted(manifest.items()):
            if st != "ok":
                print(f"✗ {name}: query dump failed ({st})")
                n_fail += 1
        missing = [n for n in oracle if n not in manifest]
        if missing:
            print(f"✗ oracle entries with no matching query: {missing}")
            n_fail += len(missing)
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        import glob
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"✗ {name}: column mismatch spark={sorted(got.columns)} duck={sorted(want.columns)}")
            n_fail += 1
            continue
        gk, wk = frame_key(got), frame_key(want)
        if gk == wk:
            print(f"✓ {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"✗ {name}: VALUE mismatch ({len(got)} vs {len(want)} rows)")
            for i, (a, b) in enumerate(zip(gk, wk)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break
            else:
                if len(gk) != len(wk):
                    print(f"    row count differs; extra side sample:")
                    longer = gk if len(gk) > len(wk) else wk
                    print(f"      {longer[min(len(gk),len(wk))]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
