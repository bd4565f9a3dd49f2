#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against DuckDB executing oracle_sql.json on the same testdata.
Compares row count, column names, and values (sorted columns, exact match
with a tiny float tolerance report). Usage:
    python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json
import sys
import glob
import os

import duckdb


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    err_path = f"{out_dir}/_verify_errors.json"
    verify_failed = set()
    if os.path.exists(err_path):
        for name, msg in json.load(open(err_path)).items():
            print(f"[VERIFY-FAILED] {name}: {msg}")
            verify_failed.add(name)
            failures += 1
    for name in sorted(oracle):
        if name in verify_failed:
            continue  # already counted via the sidecar
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            failures += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            failures += 1
            continue
        ok = True
        if list(sorted(got.columns)) != list(sorted(want.columns)):
            print(f"[COLS] {name}: spark={sorted(got.columns)} duck={sorted(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} duck={len(want)}")
            ok = False
        else:
            g = got[sorted(got.columns)]
            w = want[sorted(want.columns)]
            for c in g.columns:
                gv, wv = list(g[c]), list(w[c])
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if a != b and str(a) != str(b):
                        if isinstance(a, float) and isinstance(b, float) and abs(a - b) < 1e-12:
                            continue
                        print(f"[VAL] {name}.{c} row {i}: spark={a!r} duck={b!r}")
                        ok = False
                        break
                if not ok:
                    break
        if ok:
            print(f"[OK] {name} ({len(got)} rows)")
        else:
            failures += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q_*")) + sorted(glob.glob(f"{out_dir}/q1*")):
        name = os.path.basename(d)
        if name in oracle or not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"[ROWS-ONLY] {name}: {n} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
