#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over the same
fixture tables, and compares values (columns sorted by name, rows sorted).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"ERROR   {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        gc, gr = norm(gcols, got)
        ec, er = norm(ecols, exp)
        if gc != ec:
            print(f"FAIL    {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
        elif gr != er:
            diff = next((i for i, (a, b) in enumerate(zip(gr, er)) if a != b),
                        min(len(gr), len(er)))
            print(f"FAIL    {name}: rows {len(gr)} vs {len(er)}; first diff @{diff}:")
            print(f"        spark : {gr[diff] if diff < len(gr) else '<none>'}")
            print(f"        oracle: {er[diff] if diff < len(er) else '<none>'}")
            n_fail += 1
        else:
            print(f"PASS    {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
