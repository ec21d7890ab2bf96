#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
For each query in oracle_sql.json: run the SQL in DuckDB over the sfDir
parquet tables, read the Spark result parquet, sort columns by name,
sort rows, compare values exactly.
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
        # The driver's hasher stringifies values per-type: a DuckDB
        # HUGEINT (un-cast integer SUM) hash-mismatches Spark's BIGINT
        # even when values agree. Catch it here where the loose value
        # compare below would hide it.
        hug = [r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()
               if "HUGEINT" in r[1]]
        if hug:
            print(f"FAIL {q}: oracle cols {hug} are HUGEINT "
                  f"(cast ::BIGINT — driver hash will mismatch)")
            fails += 1
            continue
    except Exception as e:
        print(f"FAIL {q}: oracle error {e}")
        fails += 1
        continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM '{outdir}/{q}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {q}: spark result missing {e}")
        fails += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {q}: rows {len(got)} vs {len(want)}")
        fails += 1
        continue
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    bad = None
    for c in want.columns:
        wv, gv = ws[c].tolist(), gs[c].tolist()
        for i, (a, b) in enumerate(zip(wv, gv)):
            eq = (a == b) or (isinstance(a, float) and isinstance(b, float)
                              and math.isnan(a) and math.isnan(b)) \
                 or (a is None and b is None) or str(a) == str(b)
            if not eq:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {q}: col {c} row {i}: spark={b!r} oracle={a!r}")
        fails += 1
    else:
        print(f"OK   {q} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
