#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (Spark result) + <outDir>/oracle_sql.json,
registers each <sfDir>/<table>.parquet as a DuckDB view, runs the oracle
SQL, and compares row count, schema (column names), DTYPES (the driver
hashes typed values — a HUGEINT-vs-BIGINT pair fails its hash even when
every Python value compares equal; round-17's q_psi/q_mann_kendall), and
values at REPR level (repr('-0.0') != repr('0.0'): catches signed-zero
divergence the == compare hides).
"""
import sys, json, glob, os
import duckdb

def fresh_con(sf_dir):
    # fresh connection per query — mirrors the driver's process-per-
    # oracle model, and avoids a duckdb 1.0 failure mode where ~200
    # queries through ONE connection accumulate enough buffer-manager
    # state that a random later query dies with a tiny-block OOM
    # despite >100GB free (observed on q_fingerprint/q_holt_linear/
    # q_funnel_any, never reproducible in a fresh connection)
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        rd = os.path.join(out_dir, name)
        if not os.path.isdir(rd):
            continue
        con = fresh_con(sf_dir)
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{rd}/*.parquet')")
            scols = spark_rel.columns
            stypes = [str(t) for t in spark_rel.types]
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
            otypes = [str(t) for t in orel.types]
            odata = orel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA-MISMATCH spark={scols} oracle={ocols}"
            continue
        # the driver's hash is TYPED: compare dtypes per column name
        # (Spark parquet type as read by DuckDB vs the oracle's type)
        smap = dict(zip(scols, stypes))
        omap = dict(zip(ocols, otypes))
        dtype_bad = [f"{c}: spark={smap[c]} oracle={omap[c]}"
                     for c in sorted(scols) if smap[c] != omap[c]]
        if dtype_bad:
            results[name] = f"DTYPE-MISMATCH {'; '.join(dtype_bad)}"
            continue
        # reorder columns by sorted name
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        srows = [tuple(r[i] for i in sidx) for r in sdata]
        orows = [tuple(r[i] for i in oidx) for r in odata]
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
            continue
        # repr-level compare: 0.0 == -0.0 under ==, but the driver's
        # value hash distinguishes them — so must we
        sreprs = [tuple(map(repr, r)) for r in srows]
        oreprs = [tuple(map(repr, r)) for r in orows]
        if sreprs == oreprs:
            results[name] = f"OK rows={len(srows)}"
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sreprs, oreprs))
                     if a != b]
            if sorted(sreprs) == sorted(oreprs):
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
