#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs oracle_sql.json's
SQL in DuckDB over views on <sfDir>/*.parquet, sorts columns by name,
and compares row-by-row (exact values). Prints a per-query PASS/FAIL.
This is a build-side diagnostic only — the engine itself has no Python.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    # Normalize tz-aware timestamps to naive UTC. Floats compare by their
    # IEEE bit pattern (struct.pack) — the driver's hash gate is bit-exact,
    # and Python equality hides sign-bit diffs (-0.0 == 0.0) like the one
    # that shipped q_sre_root_cause red in r11.
    import datetime, struct, decimal
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    # DuckDB types round(literal) as DECIMAL where Spark has DOUBLE; the
    # driver's gate coerces those, so mirror it: decimal -> float first.
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return ("f64", struct.pack(">d", v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        try:
            want_rel = con.execute(sql)
            want_cols = [c[0] for c in want_rel.description]
            want = want_rel.fetchall()
            # read ALL part files — a multi-part result compared against
            # just files[0] would silently check partial data
            got_rel = con.execute("SELECT * FROM read_parquet(?)", [files])
            got_cols = [c[0] for c in got_rel.description]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}"); nfail += 1; continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
            nfail += 1; continue
        # The driver's hash gate is type-sensitive: an uncast DuckDB sum()
        # (HUGEINT) hash-mismatches Spark's BIGINT even when the Python
        # values compare equal below. Compare declared types per column.
        want_types = {c[0]: str(c[1]) for c in want_rel.description}
        got_types = {c[0]: str(c[1]) for c in got_rel.description}
        tbad = [c for c in want_types
                if want_types[c] != got_types[c]
                and {want_types[c], got_types[c]} != {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}]
        if tbad:
            print(f"FAIL {name}: type drift " +
                  ", ".join(f"{c}: oracle={want_types[c]} spark={got_types[c]}" for c in tbad))
            nfail += 1; continue
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wrows = [tuple(norm(r[i]) for i in wi) for r in want]
        grows = [tuple(norm(r[i]) for i in gi) for r in got]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rows want={len(wrows)} got={len(grows)}"); nfail += 1; continue
        bad = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g]
        if bad:
            i, w, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(wrows)} rows differ; first at {i}:\n  want {w}\n  got  {g}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(wrows)} rows)"); npass += 1
    print(f"== {npass} pass / {nfail} fail ==")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
