#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/validate_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), dtypes loosely, row counts, and exact
values after sorting rows by all columns.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail, ok, rows_only = [], [], []
names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
# optional argv[3]: comma-separated query-name filter (full names or qNN
# prefixes), mirroring graft.Verify's third arg — lets a local iteration
# or a straggler re-check skip the multi-hour full sf0.1 sweep
if len(sys.argv) > 3:
    wanted = {w.strip() for w in sys.argv[3].split(",") if w.strip()}
    names = [n for n in names if n in wanted or n.split("_")[0] in wanted]
for name in names:
    # incremental progress on stderr: long sf0.1 oracle passes are
    # otherwise silent for hours and impossible to attribute
    import time as _t
    print(f"[validate] {_t.strftime('%H:%M:%S')} {name}", file=sys.stderr, flush=True)
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fail.append((name, "no spark output")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fail.append((name, f"oracle error: {e}")); continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        fail.append((name, f"columns differ: spark={sc} duck={dc}")); continue
    if len(spark_df) != len(duck_df):
        fail.append((name, f"rowcount differ: spark={len(spark_df)} duck={len(duck_df)}")); continue
    a = spark_df[sc].sort_values(by=sc).reset_index(drop=True)
    b = duck_df[sc].sort_values(by=sc).reset_index(drop=True)
    mism = []
    for c in sc:
        av, bv = a[c], b[c]
        try:
            eq = (av == bv) | (av.isna() & bv.isna())
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mism.append(f"{c}[{i}]: spark={av[i]!r} duck={bv[i]!r} ({(~eq).sum()} diffs)")
    if mism:
        fail.append((name, "; ".join(mism[:3])))
    else:
        ok.append((name, len(a)))

print(f"== OK ({len(ok)}):")
for n, r in ok: print(f"  {n}: {r} rows")
print(f"== ROWS-ONLY ({len(rows_only)}):")
for n, r in rows_only: print(f"  {n}: {r} rows")
print(f"== FAIL ({len(fail)}):")
for n, m in fail: print(f"  {n}: {m}")
sys.exit(1 if fail else 0)
