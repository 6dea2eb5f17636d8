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
ok = fail = warn = 0
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
    # when pandas == succeeds (round-1 lesson: 8 DECIMAL queries). Checked
    # over the WHOLE column (a column whose early values coincide in type
    # but drifts later — mixed object dtype — must not pass), and counted
    # as its own warning category with a distinct exit code, not a VALUE
    # failure (round-2 advisor).
    twarn = []
    for c in sc:
        at = {type(v).__name__ for v in a[c] if v is not None}
        bt = {type(v).__name__ for v in b[c] if v is not None}
        if at != bt:
            twarn.append((c, sorted(at), sorted(bt)))
    if twarn:
        print(f"TYPEWARN {name}: {twarn} (values equal, repr may hash-differ in driver)")
        warn += 1
    else:
        print(f"OK       {name} ({len(spark_df)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail, {warn} typewarn; rows-only (no oracle): ", end="")
all_q = {os.path.basename(p) for p in glob.glob(os.path.join(out_dir,'*'))
         if os.path.isdir(p) and not os.path.basename(p).startswith('_aux')}
print(sorted(all_q - set(oracle)))
sys.exit(1 if fail else (2 if warn else 0))
