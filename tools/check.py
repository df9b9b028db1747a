#!/usr/bin/env python3
"""Local oracle-parity check, mimicking the driver: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same testdata and compare (columns sorted by name, rows sorted,
values hashed). Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def dtype_kinds(df: pd.DataFrame):
    # the driver hashes VALUES, so an int64 vs float64 column (e.g. DuckDB
    # HUGEINT sums widening to float in pandas) mismatches even when every
    # value is equal under ==. Surface that as a failure here too.
    return {c: df[c].dtype.kind for c in df.columns}

fails = 0
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    got_files = glob.glob(f"{qdir}/*.parquet")
    if not got_files:
        print(f"[MISS ] {name}: no parquet written"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in got_files])
    if name not in oracle:
        print(f"[ROWS ] {name}: rows={len(got)} (no oracle — rows-only)")
        if len(got) == 0:
            print(f"        WARNING: empty rows-only result")
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"[ERR  ] {name}: oracle SQL failed: {e}"); fails += 1; continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"[SCHEMA] {name}: got {list(g.columns)} vs oracle {list(e.columns)}")
        fails += 1; continue
    gk, ek = dtype_kinds(g), dtype_kinds(e)
    kind_mismatch = {c: (gk[c], ek[c]) for c in g.columns if gk[c] != ek[c]}
    if kind_mismatch:
        print(f"[DTYPE] {name}: value-kind mismatch (driver hash would differ): {kind_mismatch}")
        fails += 1; continue
    if len(g) != len(e):
        print(f"[NROWS] {name}: got {len(g)} vs oracle {len(e)}"); fails += 1; continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(f"[OK   ] {name}: rows={len(g)}")
    except AssertionError as ex:
        print(f"[DIFF ] {name}: {str(ex)[:500]}")
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
