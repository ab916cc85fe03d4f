#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential compare.

Runs after `scripts/run_class.sh graft.Verify <sfDir> <outDir>`:
for each query parquet dump in <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compares schema, row
count, and values (column-name-sorted, like the driver).

Usage: python3 scripts/compare.py <sfDir> <outDir>
"""
import json, sys, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def frame_fingerprint(df):
    """pandas DataFrame -> (schema, nrows, value hash) with columns sorted."""
    import hashlib
    df = df[sorted(df.columns)]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    schema = [(c, str(df[c].dtype)) for c in df.columns]
    return schema, len(df), h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        gs, gn, gh = frame_fingerprint(got)
        es, en, eh = frame_fingerprint(exp)
        if [c for c, _ in gs] != [c for c, _ in es]:
            results[name] = f"COLUMN_MISMATCH spark={gs} duck={es}"
        elif gn != en:
            results[name] = f"ROWCOUNT_MISMATCH spark={gn} duck={en}"
        elif gh != eh:
            diffs = []
            for c, _ in gs:
                a, b = got[sorted(got.columns)][c], exp[sorted(exp.columns)][c]
                if list(map(norm_cell, a)) != list(map(norm_cell, b)):
                    diffs.append(c)
            # dtype note to help debugging
            dt = [(c, g, e) for (c, g), (_, e) in zip(gs, es) if g != e]
            results[name] = f"HASH_MISMATCH cols={diffs} dtypes={dt}"
        else:
            dt = [(c, g, e) for (c, g), (_, e) in zip(gs, es) if g != e]
            results[name] = "OK" if not dt else f"OK_VALUES_DTYPE_DIFF {dt}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    ro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{results[k][:400]:<60}  {k}" if len(results[k]) < 60
              else f"{k}:\n    {results[k][:1500]}")
    print(f"\n== {ok} OK, {ro} rows-only, {len(results) - ok - ro} FAILED, "
          f"{len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
