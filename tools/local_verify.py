#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify's parquet
dumps + oracle_sql.json, runs each oracle in DuckDB over the same tables,
and compares schemas (sorted column names) and values (rows sorted, doubles
rounded the same way on both sides would already match — we compare exact).
Usage: local_verify.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    try:
        got = pq.read_table(f"{outdir}/{name}").to_pandas()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    wcols, gcols = sorted(want.columns), sorted(got.columns)
    if wcols != gcols:
        print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
        fail += 1
        continue
    want, got = want[wcols], got[gcols]
    if len(want) != len(got):
        print(f"FAIL {name}: rowcount {len(want)} vs {len(got)}")
        fail += 1
        continue
    # sort rows for order-insensitive compare (queries are ordered anyway)
    def norm(df):
        return df.apply(lambda c: c.astype("float64") if c.dtype.kind in "fi" else c.astype(str)) \
                 .sort_values(by=list(df.columns)).reset_index(drop=True)
    w, g = norm(want), norm(got)
    bad = None
    for c in wcols:
        if w[c].dtype.kind == "f":
            eq = [(a == b) or (math.isnan(a) and math.isnan(b)) or a == b
                  for a, b in zip(w[c], g[c])]
            exact = all(eq)
            if not exact:
                diffs = [(a, b) for a, b in zip(w[c], g[c]) if a != b][:3]
                bad = (c, diffs)
                break
        else:
            if not (w[c] == g[c]).all():
                diffs = [(a, b) for a, b in zip(w[c], g[c]) if a != b][:3]
                bad = (c, diffs)
                break
    if bad:
        print(f"FAIL {name}: col {bad[0]} mismatches, e.g. {bad[1]}")
        fail += 1
    else:
        print(f"OK   {name} ({len(want)} rows)")
        ok += 1

# rows-only entries (no oracle): check the parquet exists and has rows
import os
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        try:
            n = pq.read_table(p).num_rows
            print(f"ROWS {d}: {n} rows")
        except Exception as e:
            print(f"FAIL {d}: unreadable: {e}")
            fail += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracled")
sys.exit(1 if fail else 0)
