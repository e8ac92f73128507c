#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json on DuckDB views over the
sfDir parquet tables, and compares the two result sets exactly (columns
sorted by name, rows sorted by all columns, values compared after a
canonical repr). Exit code 1 if any mismatch.

IMPORTANT: both sides are fetched through pandas (`.df()`), mirroring the
driver's compare. This is dtype-sensitive on purpose: DuckDB `sum()` over
any integer type returns HUGEINT, which pandas converts to float64, so an
oracle `sum(bigint_col)` hashes as "431.0" against Spark's int64 "431" and
FAILS even though the values are numerically equal. The fix is always a
`CAST(sum(...) AS BIGINT)` in the oracle SQL, never a looser compare here.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon_df(df):
    """Dtype-sensitive canonical form of a pandas frame: columns sorted by
    name, every value repr'd the way the driver's hash sees it, rows sorted."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, (bytes, bytearray)):
                vals.append(bytes(v).hex())
            elif isinstance(v, float):
                vals.append(repr(v))          # exact double repr; int64 stays int
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out

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
        got_df = con.execute(f"SELECT * FROM '{files[0]}'").df()
        if name not in oracle:
            print(f"rows  {name}: {len(got_df)} rows (no oracle)"); n_rowsonly += 1
            continue
        try:
            exp_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, gr = canon_df(got_df)
        ec, er = canon_df(exp_df)
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
