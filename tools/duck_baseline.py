#!/usr/bin/env python3
"""Re-time the DuckDB oracle set (the BENCH baseline's denominator).

Usage: python3 tools/duck_baseline.py <sfDir> <oracle_sql.json> <out.json>

Protocol (same as the r3 addendum / r8 re-baseline in BASELINE.md): one
DuckDB connection, one view per parquet table, every oracle SQL executed
sequentially with full fetch, two passes, min-of-two per query.
Build-side diagnostic only — the engine itself has no Python.
"""
import sys, os, json, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sfdir, oracles_path, out_path):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracles_path))
    names = sorted(oracles)
    times = {n: [] for n in names}
    totals = []
    for p in range(2):
        t0 = time.monotonic()
        for n in names:
            q0 = time.monotonic()
            con.execute(oracles[n]).fetchall()
            times[n].append(time.monotonic() - q0)
        totals.append(time.monotonic() - t0)
    mins = {n: round(min(ts), 4) for n, ts in times.items()}
    out = {
        "oracle_count": len(names),
        "min_total": round(sum(mins.values()), 3),
        "pass1_total": round(totals[0], 3),
        "pass2_total": round(totals[1], 3),
        "queries": mins,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{out['oracle_count']} oracles, min_total {out['min_total']} s "
          f"(p1 {out['pass1_total']}, p2 {out['pass2_total']})")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
