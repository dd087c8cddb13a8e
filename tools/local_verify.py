#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/local_verify.py /tmp/verify_out
(after: sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out")

For each <name>/ parquet dir in outDir, runs oracle_sql.json[name] in DuckDB
over /root/testdata/sf0.01 views and compares values column-name-sorted,
row-by-row. Doubles must match exactly (the engine is engineered for bit
parity via decimal sums); any drift is reported with the max abs diff.
"""
import json, math, sys, glob, os
import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

def main(out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for skip in os.environ.get("SKIP_ORACLES", "").split(","):
        oracle.pop(skip, None)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        eng = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            if len(eng) == 0:
                print(f"FAIL {name}: rows-only check produced 0 rows")
                n_fail += 1
            else:
                print(f"SKIP {name}: rows-only check, rows={len(eng)}")
            continue
        try:
            ora = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        ecols, ocols = sorted(eng.columns), sorted(ora.columns)
        if ecols != ocols:
            print(f"FAIL {name}: columns {ecols} vs {ocols}"); n_fail += 1; continue
        if len(eng) != len(ora):
            print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}"); n_fail += 1; continue
        bad = 0; first = None; maxdiff = 0.0
        for c in ecols:
            ev, ov = eng[c].tolist(), ora[c].tolist()
            for i, (a, b) in enumerate(zip(ev, ov)):
                if (a is None) != (b is None):
                    bad += 1; first = first or (c, i, a, b); continue
                if canon(a) != canon(b):
                    bad += 1
                    if first is None: first = (c, i, a, b)
                    if isinstance(a, float) and isinstance(b, float):
                        maxdiff = max(maxdiff, abs(a - b))
        if bad:
            print(f"FAIL {name}: {bad} mismatched values, first={first}, maxdiff={maxdiff}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(eng)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)-n_pass-n_fail} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"))
