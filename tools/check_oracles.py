#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify parquet
dumps against DuckDB oracle results (rows, schema-ish, value hash)."""
import duckdb, json, sys, glob, os
import pyarrow.parquet as pq

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = fail = 0
for name in sorted(oracle):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        print(f"MISSING  {name}: no parquet output"); fail += 1; continue
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"SCHEMA   {name}: spark={sc} duck={dc}"); fail += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}"); fail += 1; continue
    a, b = spark_df[sc], duck_df[sc]
    mismatch = None
    for c in sc:
        av, bv = list(a[c]), list(b[c])
        for i, (x, y) in enumerate(zip(av, bv)):
            import math
            eq = (x == y)
            try:
                if isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y): eq = True
            except Exception: pass
            if x is None and y is None: eq = True
            try:
                import pandas as pd
                if pd.isna(x) and pd.isna(y): eq = True
            except Exception: pass
            if not eq:
                mismatch = (c, i, x, y); break
        if mismatch: break
    if mismatch:
        c, i, x, y = mismatch
        print(f"VALUE    {name}: col={c} row={i} spark={x!r} duck={y!r} (types {type(x).__name__}/{type(y).__name__})")
        fail += 1
        continue
    # strict: value types must match too — the driver hashes a canonical
    # serialization, so Decimal-vs-float or str-repr drift fails there even
    # when pandas == succeeds (round-1 lesson: 8 DECIMAL queries)
    twarn = []
    for c in sc:
        ax = next((v for v in a[c] if v is not None), None)
        bx = next((v for v in b[c] if v is not None), None)
        if ax is not None and bx is not None and type(ax).__name__ != type(bx).__name__:
            twarn.append((c, type(ax).__name__, type(bx).__name__))
    if twarn:
        print(f"TYPEWARN {name}: {twarn} (values equal, repr may hash-differ in driver)")
        fail += 1
    else:
        print(f"OK       {name} ({len(spark_df)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail; rows-only (no oracle): ", end="")
all_q = {os.path.basename(p) for p in glob.glob(os.path.join(out_dir,'*')) if os.path.isdir(p)}
print(sorted(all_q - set(oracle)))
