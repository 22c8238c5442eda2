#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir> [json_out]

With json_out, also writes the per-query results in the driver's
CORRECTNESS_r{N}.json schema ({rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err} per query) — committed each round as
CORRECTNESS_SELF.json so the repo carries its own correctness record even
if a driver-side harness failure loses the round's artifact (round 7's
came back literally `{}`).

Reads each <name>/ parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB against the sf parquet tables, and compares:
row count, column names (sorted), and a hash of all values (columns sorted
by name, rows sorted canonically) — strictest plausible interpretation of
the driver's check.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: sort by all columns in cell-normalized form (so
    # int64 vs float64 dtype skew between engines can't reorder rows)
    if len(df) > 0:
        key = df.map(cell).agg("|".join, axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df

def cell(v):
    # repr() keeps full double precision: the driver's hash is bit-strict,
    # so a 6-sig-digit normalization here would pass values the driver fails
    # (seen round 3 on e15_ewma's 6th-decimal rounding ties).
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main(outdir, sfdir, json_out=None):
    results = {}
    def record(name, **kw):
        results[name] = {"rows_match": kw.get("rows_match"),
                         "schema_match": kw.get("schema_match"),
                         "hash_match": kw.get("hash_match"),
                         "spark_rows": kw.get("spark_rows"),
                         "oracle_rows": kw.get("oracle_rows"),
                         "err": kw.get("err")}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(f"{outdir}/{d}"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1
            record(name, err="no_output"); continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            status = "ROWS " if len(got) > 0 else "FAIL "
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_rowsonly += 1 if len(got) > 0 else 0
            n_fail += 0 if len(got) > 0 else 1
            record(name, spark_rows=len(got), err="no_oracle")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}"); n_fail += 1
            record(name, spark_rows=len(got), err=f"oracle error: {e}"[:300])
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            record(name, rows_match=len(g) == len(e), schema_match=False,
                   spark_rows=len(g), oracle_rows=len(e), err="schema mismatch")
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}"); n_fail += 1
            record(name, rows_match=False, schema_match=True,
                   spark_rows=len(g), oracle_rows=len(e), err="row count mismatch")
            continue
        hg, he = table_hash(g), table_hash(e)
        if hg != he:
            print(f"FAIL  {name}: hash mismatch")
            diff = (g.astype(str) != e.astype(str))
            idx = diff.any(axis=1)
            print("  spark:", g[idx].head(3).to_dict("records"))
            print("  duckdb:", e[idx].head(3).to_dict("records"))
            n_fail += 1
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e), err="hash mismatch")
            continue
        print(f"PASS  {name}: rows={len(g)}"); n_pass += 1
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(g), oracle_rows=len(e))
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail / {len(names)} queries")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
