#!/usr/bin/env python3
"""Local simulation of the driver's t2 gate: run each oracle_sql.json
query in DuckDB over the sf parquet tables and compare to the Spark
parquet dumps produced by graft.Verify (sorted rows/columns, values
rounded to 9 significant-ish digits). Dev tool only — not part of the
engine."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    con.execute(f"create view {name} as select * from read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if v == 0: v = 0.0
                row.append(f"{v:.9g}" if not (isinstance(v, float) and math.isnan(v)) else "nan")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.execute(f"select * from read_parquet('{out_dir}/{name}/*.parquet')").df()
    want = con.execute(sql).df()
    gc, gr = norm(got)
    wc, wr = norm(want)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}"); fails += 1; continue
    if len(gr) != len(wr):
        print(f"FAIL {name}: rows {len(gr)} != {len(wr)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(gr, wr) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}"); fails += 1
    else:
        print(f"OK   {name} ({len(gr)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
