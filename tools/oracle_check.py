#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json on DuckDB views over the
sfDir parquet tables, and compares the two result sets exactly (columns
sorted by name, rows sorted by all columns, values compared after a
canonical repr). Exit code 1 if any mismatch.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(v))          # exact double repr
            elif isinstance(v, bytes):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no result parquet"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"rows  {name}: {len(grows)} rows (no oracle)"); n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} vs oracle {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL  {name}: {len(gr)} rows vs oracle {len(er)}"); n_fail += 1; continue
        if gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark:  {gr[bad]}")
            print(f"      oracle: {er[bad]}")
            n_fail += 1; continue
        print(f"PASS  {name}: {len(gr)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
