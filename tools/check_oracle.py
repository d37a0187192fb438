#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (Spark result) + <outDir>/oracle_sql.json,
registers each <sfDir>/<table>.parquet as a DuckDB view, runs the oracle
SQL, and compares row count, schema (column names), and values
(column-name-sorted, row-order-sensitive).
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        rd = os.path.join(out_dir, name)
        if not os.path.isdir(rd):
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{rd}/*.parquet')")
            scols = spark_rel.columns
            sdata = spark_rel.fetchall()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(sdata)}"
            continue
        try:
            orel = con.sql(oracle[name])
            ocols = orel.columns
            odata = orel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA-MISMATCH spark={scols} oracle={ocols}"
            continue
        # reorder columns by sorted name
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        srows = [tuple(r[i] for i in sidx) for r in sdata]
        orows = [tuple(r[i] for i in oidx) for r in odata]
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
            continue
        if srows == orows:
            results[name] = f"OK rows={len(srows)}"
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            if sorted(map(repr, srows)) == sorted(map(repr, orows)):
                results[name] = f"ORDER-ONLY-MISMATCH rows={len(srows)}"
            else:
                i, a, b = diffs[0]
                results[name] = (f"VALUE-MISMATCH {len(diffs)}/{len(srows)} rows; "
                                 f"first@{i}: spark={a} oracle={b} cols={sorted(scols)}")
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        tag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("NO-ORACLE") else "FAIL")
        print(f"[{tag}] {k}: {v}")
    print(f"\n{ok}/{len([v for v in results.values() if not v.startswith('NO-ORACLE')])} oracle queries pass")

if __name__ == "__main__":
    main()
