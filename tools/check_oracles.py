#!/usr/bin/env python3
"""Local oracle cross-check: mimics the driver's DuckDB compare.

Usage: python3 tools/check_oracles.py <sf_dir> <verify_out_dir>
Compares each <out>/<name> parquet against the oracle SQL in
<out>/oracle_sql.json run by DuckDB over <sf_dir>/*.parquet.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    # Spark-staged tables (e.g. testdata-sf1) are directories of parts
    src = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
# optional 3rd arg: comma-separated query names (targeted / sharded runs)
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
ok, bad = [], []

# Output-type lint: every oracle's result schema must use only
# engine-portable types. DuckDB-internal widenings (HUGEINT from
# list_sum / sum(BIGINT), DECIMAL, unsigned ints) hash differently
# from the engine's int64 dumps even when values are identical —
# the r13/r14 stream_pq_codes/cdc_vectors signature. Fail loudly.
import re
NON_PORTABLE = re.compile(
    r"\b(U?HUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|DECIMAL|"
    r"INTERVAL|BIT|UUID)\b", re.IGNORECASE)
def portable(t):
    return NON_PORTABLE.search(t) is None
lint_bad = []
for name in (sorted(only) if only is not None else sorted(oracles)):
    if name not in oracles:
        continue
    try:
        cols = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
    except Exception as e:
        lint_bad.append((name, f"DESCRIBE failed: {e}"))
        continue
    for cname, ctype, *_ in cols:
        if not portable(ctype):
            lint_bad.append((name, f"column {cname} has non-portable type {ctype}"))
if lint_bad:
    print("== ORACLE TYPE LINT FAILURES ==")
    for n, m in lint_bad:
        print(f"  {n}: {m}")
    bad.extend(lint_bad)
else:
    n_linted = len(only & set(oracles)) if only is not None else len(oracles)
    print(f"[lint] oracle output types portable: {n_linted} oracles OK")
import time
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if only is not None and name not in only:
        continue
    t0 = time.time()
    print(f"[check] {name} ...", flush=True)
    spark_df = pq.read_table(d).to_pandas()
    if name not in oracles:
        status = f"rows-only ({len(spark_df)} rows)"
        (ok if len(spark_df) > 0 else bad).append((name, status))
        continue
    try:
        duck_df = con.execute(oracles[name]).df()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    s = spark_df[sorted(spark_df.columns)]
    k = duck_df[sorted(duck_df.columns)] if set(duck_df.columns) == set(spark_df.columns) else None
    if k is None:
        bad.append((name, f"column mismatch spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
        continue
    if len(s) != len(k):
        bad.append((name, f"row count spark={len(s)} duck={len(k)}"))
        continue
    s2 = s.sort_values(by=list(s.columns), ignore_index=True)
    k2 = k.sort_values(by=list(k.columns), ignore_index=True)
    mismatched = []
    for c in s.columns:
        a, b = s2[c], k2[c]
        try:
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                eq = pd.to_datetime(a).astype("datetime64[us]").equals(
                    pd.to_datetime(b).astype("datetime64[us]"))
            else:
                eq = a.astype(object).equals(b.astype(object))
        except Exception as e:
            eq = False
        if not eq:
            mismatched.append(c)
    if mismatched:
        bad.append((name, f"value mismatch in cols {mismatched}; spark dtypes={dict(s.dtypes.astype(str))} duck={dict(k.dtypes.astype(str))}"))
        for c in mismatched[:2]:
            diff = s2[s2[c].astype(object) != k2[c].astype(object)]
            print(f"--- {name}.{c}: first diffs\nspark:\n{s2.loc[diff.index[:3]]}\nduck:\n{k2.loc[diff.index[:3]]}")
    else:
        ok.append((name, f"MATCH ({len(s)} rows)"))

print(f"\n== OK ({len(ok)}) ==")
for n, m in ok:
    print(f"  {n}: {m}")
print(f"\n== BAD ({len(bad)}) ==")
for n, m in bad:
    print(f"  {n}: {m}")
sys.exit(1 if bad else 0)
