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

def lint_types(name, arrow_tbl, spark_types):
    """Reject oracle output types the driver's hash canonicalization treats
    differently from Spark's even when values are equal. DuckDB leaves
    sum(BIGINT) as HUGEINT (arrow decimal128) unless cast — this shipped
    red driver hashes in rounds 1, 5 and 6 (q_bpe_pairs, q_interval_coverage,
    q_label_noise) while the value-compare below stayed green. Everything
    must land as int/float/string/bool/timestamp/date/list, never decimal."""
    errs = []
    for field in arrow_tbl.schema:
        t = str(field.type)
        if t.startswith("decimal"):
            errs.append(f"oracle column '{field.name}' is {t} "
                        f"(uncast sum()? wrap in CAST(... AS BIGINT/DOUBLE))")
        st = spark_types.get(field.name)
        if st is not None and st != t and not t.startswith("decimal"):
            # informational: driver may still canonicalize these equal
            print(f"LINT    {name}: column '{field.name}' spark={st} oracle={t}")
    return errs

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
            gtbl = con.execute(
                f"SELECT * FROM read_parquet({files!r})").arrow()
            got = [tuple(r.values()) for r in gtbl.to_pylist()]
            gcols = gtbl.schema.names
            etbl = con.execute(sql).arrow()
            exp = [tuple(r.values()) for r in etbl.to_pylist()]
            ecols = etbl.schema.names
        except Exception as e:
            print(f"ERROR   {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        spark_types = {f.name: str(f.type) for f in gtbl.schema}
        type_errs = lint_types(name, etbl, spark_types)
        if type_errs:
            for msg in type_errs:
                print(f"FAIL    {name}: {msg}")
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
