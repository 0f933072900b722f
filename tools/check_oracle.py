#!/usr/bin/env python3
# Dev-side oracle compare (mirrors the driver): runs each oracle SQL from
# /tmp/verify_out/oracle_sql.json in DuckDB over the sf0.01 parquet tables and
# compares values+dtypes against the Spark parquet dumps, columns sorted by
# name. Usage: python3 tools/check_oracle.py  (after runMain graft.Verify).
import duckdb, json, glob, os, math
import pyarrow.parquet as pq
sf='/root/testdata/sf0.01'
con=duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle=json.load(open('/tmp/verify_out/oracle_sql.json'))
for name in sorted(os.listdir('/tmp/verify_out')):
    d=f'/tmp/verify_out/{name}'
    if not os.path.isdir(d): continue
    files=glob.glob(f'{d}/*.parquet')
    spark_tbl=pq.read_table(files[0]) if files else None
    if name not in oracle:
        print(f"{name}: rows-only ({spark_tbl.num_rows} rows)")
        continue
    try:
        ora=con.sql(oracle[name]).arrow()
    except Exception as ex:
        print(f"{name}: ORACLE SQL ERROR: {ex}"); continue
    import pandas as pd
    a=spark_tbl.to_pandas(); b=ora.to_pandas()
    a=a[sorted(a.columns)]; b=b[sorted(b.columns)]
    if list(a.columns)!=list(b.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"); continue
    if len(a)!=len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"); continue
    a=a.sort_values(by=list(a.columns), ignore_index=True)
    b=b.sort_values(by=list(b.columns), ignore_index=True)
    bad=[]
    for c in a.columns:
        av,bv=a[c],b[c]
        if str(av.dtype)!=str(bv.dtype):
            bad.append(f"dtype {c}: {av.dtype} vs {bv.dtype}")
        eq = (av.isna()&bv.isna()) | (av==bv)
        if not eq.all():
            i=(~eq).idxmax()
            bad.append(f"value {c}@row{i}: {av[i]!r} vs {bv[i]!r}")
    print(f"{name}: {'OK '+str(len(a))+' rows' if not bad else 'MISMATCH '+'; '.join(bad[:3])}")
