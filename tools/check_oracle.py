#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each entry in oracle_sql.json: register each parquet table of sfDir as a
DuckDB view, run the SQL, load the Spark-written parquet, sort columns by
name, sort rows, and compare values (with exact match on non-floats and
tolerant match on floats so we see WHERE a hash-style compare would differ).
"""
import json, math, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    sdf_files = glob.glob(os.path.join(out, name, "*.parquet"))
    if not sdf_files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({sdf_files!r})").fetchdf()
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
        fails += 1
        continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
        fails += 1
        continue
    o = o.sort_values(list(o.columns)).reset_index(drop=True)
    s = s.sort_values(list(s.columns)).reset_index(drop=True)
    bad = None
    for c in o.columns:
        ov, sv = o[c], s[c]
        # the driver's hash compare is dtype-KIND-sensitive: DuckDB HUGEINT →
        # float64 vs Spark int64 hashed differently even when values matched
        # (round-1 q_agg_pricing et al.), while int32 vs int64 hashed equal
        # (round-1 q_strings et al. were hash_match:true). Reproduce that.
        if ov.dtype.kind != sv.dtype.kind:
            bad = f"col {c} dtype-kind oracle={ov.dtype} spark={sv.dtype}"
            break
        if ov.dtype.kind == "f" or sv.dtype.kind == "f":
            exact = all(
                (math.isnan(a) and math.isnan(b)) or a == b
                for a, b in zip(ov.astype(float), sv.astype(float)))
            if not exact:
                close = all(
                    (math.isnan(a) and math.isnan(b)) or abs(a - b) <= 1e-9 * max(1, abs(a))
                    for a, b in zip(ov.astype(float), sv.astype(float)))
                bad = f"col {c} float {'CLOSE-BUT-NOT-EXACT' if close else 'DIFFERS'}"
                break
        else:
            if not (ov.astype(str) == sv.astype(str)).all():
                idx = (ov.astype(str) != sv.astype(str)).idxmax()
                bad = f"col {c} row {idx}: oracle={ov[idx]!r} spark={sv[idx]!r}"
                break
    if bad:
        print(f"FAIL {name}: {bad}")
        fails += 1
    else:
        print(f"ok   {name} ({len(o)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
