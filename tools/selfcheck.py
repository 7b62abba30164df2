#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with the Verify.scala dump.
Usage: selfcheck.py <sfdir> <verify_out_dir> [json_out]

With `json_out`, also writes a driver-shaped per-query artifact
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so every round carries committed, diffable correctness evidence
even if the driver's own CORRECTNESS_r{N}.json transport fails (as it
did in rounds 7 and 13).
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(path):
    return pq.read_table(path).to_pandas()


def main(sfdir, outdir, json_out=None):
    import os
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        # Tolerate partial fixture dirs (tools/OracleFixture writes only
        # the tables its queries touch) and Spark-written directory
        # parquet alongside the driver's single-file layout.
        path = f"{sfdir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import glob
    import os
    dumped = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    fails = []
    def record(name, rows_match, schema_match, hash_match, spark_rows,
               oracle_rows, err):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    for name in sorted(dumped):
        spark_df = load_spark(f"{outdir}/{name}")
        if name not in oracle:
            if len(spark_df) == 0:
                print(f"✗ {name}: rows-only query returned 0 rows")
                fails.append(name)
                record(name, False, None, None, 0, None, "rows-only: 0 rows")
            else:
                print(f"  [rows-only] {name}: {len(spark_df)} rows")
                record(name, True, None, None, len(spark_df), None, None)
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            fails.append(name)
            record(name, None, None, None, len(spark_df), None,
                   f"oracle sql error: {e}")
            continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"✗ {name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}")
            fails.append(name)
            record(name, None, False, False, len(s), len(d),
                   f"column mismatch spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if len(s) != len(d):
            print(f"✗ {name}: row count spark={len(s)} duck={len(d)}")
            fails.append(name)
            record(name, False, True, False, len(s), len(d), None)
            continue
        bad = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                import numpy as np
                if str(sv.dtype).startswith("float") or str(dv.dtype).startswith("float"):
                    eq = np.asarray((sv.isna() & dv.isna()) | (sv.values == dv.values))
                else:
                    eq = np.asarray(sv.astype(str).values == dv.astype(str).values)
                if not eq.all():
                    idx = (~eq).nonzero()[0][:3]
                    bad = (c, [(int(i), sv.iloc[i], dv.iloc[i]) for i in idx])
                    break
            except Exception as e:
                bad = (c, f"compare error: {e}")
                break
        if bad:
            print(f"✗ {name}: col '{bad[0]}' differs; first: {bad[1]}")
            print(f"    spark dtypes: {dict(s.dtypes.astype(str))}")
            print(f"    duck  dtypes: {dict(d.dtypes.astype(str))}")
            fails.append(name)
            record(name, True, True, False, len(s), len(d),
                   f"col '{bad[0]}' differs; first: {bad[1]}")
        else:
            # dtype visibility (the driver may also compare schemas)
            dt_mismatch = [
                (c, str(s[c].dtype), str(d[c].dtype))
                for c in s.columns if str(s[c].dtype) != str(d[c].dtype)]
            note = f"  [dtype note: {dt_mismatch}]" if dt_mismatch else ""
            print(f"✓ {name}: {len(s)} rows exact match{note}")
            record(name, True, True, True, len(s), len(d), None)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} queries)")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL MATCH")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
