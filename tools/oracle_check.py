#!/usr/bin/env python3
"""Local driver-mimic: run each oracle_sql.json query in DuckDB against the
sf tables and compare with the Verify parquet dumps (sort columns by name,
sort rows, compare values). Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import sys, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"select * from read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: no spark output: {e}"); fails += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    if got.dtypes.tolist() != want.dtypes.tolist():
        print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {want.dtypes.tolist()}")
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1; continue
    ok = True
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            same = (a == b) or (a is None and b is None) or \
                (isinstance(a, float) and isinstance(b, float) and
                 (math.isnan(a) and math.isnan(b) or a == b))
            # pandas None/NaN normalization
            if not same and str(a) == str(b):
                same = True
            if not same:
                print(f"FAIL {name}: col {c} row {i}: {a!r} vs {b!r}")
                ok = False; fails += 1
                break
        if not ok:
            break
    if ok:
        print(f"PASS {name} ({len(g)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
