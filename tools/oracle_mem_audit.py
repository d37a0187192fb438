#!/usr/bin/env python3
"""Per-oracle DuckDB peak-memory audit (VERDICT r18 task #1).

For each entry in <outDir>/oracle_sql.json, runs the oracle SQL in a
FRESH subprocess (mirroring the driver's per-query process model) under
a descending ladder of `SET memory_limit` values and records the
smallest limit at which the query completes. No spill directory is set
(the driver's in-memory connection has none), so the reading is a true
in-RAM peak bound, not an out-of-core one.

Usage: python3 tools/oracle_mem_audit.py <sfDir> <oracleJson> <outJson>
"""
import sys, json, subprocess, os, re

LADDER = ["64MB", "128MB", "256MB", "512MB", "1GB", "2GB", "4GB"]

# round-20 oracles ship a self-limiting "SET memory_limit=...; SET
# threads=...;" preamble (Verify.scala); strip any leading SET
# statements so the ladder, not the preamble, controls the limit
PREAMBLE_RE = re.compile(r"^\s*(SET\s+[^;]+;\s*)+", re.IGNORECASE)

RUNNER = r"""
import sys, json, glob, os
import duckdb
sf_dir, limit, sql = sys.argv[1], sys.argv[2], sys.stdin.read()
con = duckdb.connect()
con.execute(f"SET memory_limit='{limit}'")
con.execute("SET threads=8")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
rows = con.sql(sql).fetchall()
print(len(rows))
"""


def try_limit(sf_dir, sql, limit):
    r = subprocess.run([sys.executable, "-c", RUNNER, sf_dir, limit],
                       input=sql, capture_output=True, text=True, timeout=600)
    return r.returncode == 0, (r.stderr or "").strip().splitlines()[-1:] or [""]


def main():
    sf_dir, oracle_json, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    oracles = json.load(open(oracle_json))
    results = {}
    for i, (name, raw_sql) in enumerate(sorted(oracles.items())):
        sql = PREAMBLE_RE.sub("", raw_sql)
        min_ok = None
        err = None
        # walk the ladder upward from the bottom; the first pass is the
        # minimal bound (monotone in the limit)
        for limit in LADDER:
            ok, tail = try_limit(sf_dir, sql, limit)
            if ok:
                min_ok = limit
                break
            err = tail[0] if tail else "?"
        results[name] = {"min_limit": min_ok, "err_at_fail": None if min_ok == LADDER[0] else err}
        print(f"[{i+1}/{len(oracles)}] {name}: {min_ok or 'FAIL@' + LADDER[-1]}", flush=True)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    # summary: anything above 256MB is worth a look
    heavy = {k: v["min_limit"] for k, v in results.items()
             if v["min_limit"] not in ("64MB", "128MB", "256MB")}
    print("HEAVY (>256MB):", json.dumps(heavy, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
