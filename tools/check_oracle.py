#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
Reads each <outdir>/<name> parquet dir + <outdir>/oracle_sql.json, runs the
oracle in DuckDB over <sfdir>/*.parquet views, and compares row counts,
column names, and values (column-name-sorted, like the driver).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, '*.parquet')):
    name = os.path.basename(f)[:-len('.parquet')]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    pq = os.path.join(outdir, name)
    if not os.path.isdir(pq):
        bad.append((name, 'NO SPARK OUTPUT')); continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        bad.append((name, f'spark read fail: {e}')); continue
    try:
        oracle_df = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f'oracle fail: {str(e)[:200]}')); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        bad.append((name, f'cols spark={list(a.columns)} oracle={list(b.columns)}')); continue
    if len(a) != len(b):
        bad.append((name, f'rows spark={len(a)} oracle={len(b)}')); continue
    # The driver hashes VALUES AS TYPED: a DuckDB HUGEINT sum surfaces as
    # float64 ("40.0") while the engine emits int64 ("40") — value-equal but
    # hash-different. Replicate that: an engine integer column whose oracle
    # twin comes back float is a FAIL (the oracle SQL needs CAST(.. AS BIGINT)),
    # even though the numeric values match. Int-width differences (int32 vs
    # int64) are fine — the driver's hasher renders both identically.
    dtype_bad = []
    for c in a.columns:
        sk = a[c].dtype.kind
        ok_kind = b[c].dtype.kind
        if sk in 'iu' and ok_kind == 'f':
            dtype_bad.append(f'{c}: spark {a[c].dtype} vs oracle {b[c].dtype} (add CAST(.. AS BIGINT) in oracle SQL)')
    if dtype_bad:
        bad.append((name, 'dtype widen: ' + '; '.join(dtype_bad))); continue
    try:
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True),
                                      check_dtype=False, check_exact=True)
        ok.append(name)
    except AssertionError as e:
        msg = str(e).split('\n')
        bad.append((name, ' | '.join(msg[:3])))

print(f"PASS {len(ok)}/{len(oracle)}")
for n in ok: print(f"  ok {n}")
for n, why in bad: print(f"  FAIL {n}: {why}")
sys.exit(1 if bad else 0)
