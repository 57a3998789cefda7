#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output in
<outdir>, run its oracle SQL in DuckDB over the same parquet tables, then
compare (rows, schema-by-sorted-column-name, value hash with doubles rounded).
Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

sf, outdir = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

results = {}
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        results[name] = {"status": "NO_OUTPUT"}
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracles:
        results[name] = {"status": "rows_only", "rows": len(spark_df)}
        continue
    try:
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = {"status": "ORACLE_SQL_ERROR", "err": str(e)[:300]}
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        results[name] = {"status": "SCHEMA_MISMATCH",
                         "spark": list(a.columns), "oracle": list(b.columns)}
    elif len(a) != len(b):
        results[name] = {"status": "ROWCOUNT_MISMATCH", "spark": len(a), "oracle": len(b)}
    else:
        eq = a.astype(str).values == b.astype(str).values
        if eq.all():
            results[name] = {"status": "PASS", "rows": len(a)}
        else:
            bad = np.where(~eq.all(axis=1))[0][:3]
            diffs = []
            for i in bad:
                row_diff = {c: [str(a.iloc[i][c]), str(b.iloc[i][c])]
                            for c in a.columns if str(a.iloc[i][c]) != str(b.iloc[i][c])}
                diffs.append({"row": int(i), "diff": row_diff})
            results[name] = {"status": "VALUE_MISMATCH",
                             "n_bad": int((~eq.all(axis=1)).sum()), "sample": diffs}

npass = sum(1 for r in results.values() if r["status"] == "PASS")
nrows = sum(1 for r in results.values() if r["status"] == "rows_only")
print(json.dumps(results, indent=1, default=str))
print(f"\n== {npass} PASS, {nrows} rows_only, "
      f"{len(results)-npass-nrows} FAIL of {len(results)}", file=sys.stderr)
