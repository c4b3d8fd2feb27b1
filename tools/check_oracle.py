#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: run each oracle SQL in DuckDB over
the sf parquet tables, load the Spark-side parquet dump, sort columns by
name, and compare values (exact on hash of stringified values)."""
import sys, json, glob, duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0

# Gate 0: Verify.scala records every query that threw (and the total query
# count) in failed.json — a broken query must fail this gate, not vanish.
import os
if os.path.exists(f"{outdir}/failed.json"):
    fj = json.load(open(f"{outdir}/failed.json"))
    if fj.get("failed"):
        print(f"FAIL verify-harness: {len(fj['failed'])} queries threw: {fj['failed']}")
        fail += 1
    ndirs = len([d for d in os.listdir(outdir)
                 if os.path.isdir(f"{outdir}/{d}")])
    if ndirs != fj.get("total", ndirs):
        print(f"FAIL verify-harness: {ndirs} result dirs != {fj['total']} queries")
        fail += 1
else:
    print("WARN no failed.json (old Verify dump?) — count gate skipped")
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns {list(o.columns)} vs {list(s.columns)}"); fail += 1; continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows {len(o)} vs {len(s)}"); fail += 1; continue
    om = o.astype(str).values.tolist()
    sm = s.astype(str).values.tolist()
    if om != sm:
        ndiff = sum(1 for a, b in zip(om, sm) if a != b)
        print(f"FAIL {name}: {ndiff}/{len(om)} rows differ; first: ")
        for a, b in zip(om, sm):
            if a != b:
                print("   oracle:", a); print("   spark :", b); break
        fail += 1; continue
    print(f"ok   {name} ({len(o)} rows)"); ok += 1
print(f"== {ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
