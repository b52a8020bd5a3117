import duckdb, json, os, sys, glob
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r4b"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    spark_dir = f"{out}/{name}"
    try:
        o = con.execute(sql).fetchdf()
        s = pd.read_parquet(spark_dir)
        o = o.reindex(sorted(o.columns), axis=1)
        s = s.reindex(sorted(s.columns), axis=1)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: schema {list(s.columns)} vs oracle {list(o.columns)}"); fail += 1; continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); fail += 1; continue
        oa = o.astype(str).sort_values(by=list(o.columns)).reset_index(drop=True)
        sa = s.astype(str).sort_values(by=list(s.columns)).reset_index(drop=True)
        if not oa.equals(sa):
            diff = (oa != sa).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([sa[diff].head(3).add_suffix('_spark'), oa[diff].head(3).add_suffix('_oracle')], axis=1).to_string())
            fail += 1; continue
        ok += 1
        print(f"ok   {name} ({len(s)} rows)")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fail += 1
print(f"\n{ok}/{ok+fail} oracles match")
