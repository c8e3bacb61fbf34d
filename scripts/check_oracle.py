#!/usr/bin/env python3
"""Dev-only cross-check of SparkEntry.queries parquet dumps against the
DuckDB oracle SQL — mirrors what the grading driver does. Not part of the
shipped library (the engine itself is pure Scala/Spark).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want = con.sql(oracles[name]).df()
        ok = True
        msgs = []
        if sorted(got.columns) != sorted(want.columns):
            ok = False
            msgs.append(f"columns {sorted(got.columns)} vs {sorted(want.columns)}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rowcount {len(got)} vs {len(want)}")
        else:
            g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
            for c in sorted(got.columns):
                gc, wc = g[c], w[c]
                # Dtype-strict like the driver's raw-frame hash: a Spark
                # int64 column vs a DuckDB HUGEINT-materialized float64 (or
                # a bare CASE's int32) must FAIL here, never be coerced.
                if str(gc.dtype) != str(wc.dtype):
                    ok = False
                    msgs.append(f"col {c} dtype {gc.dtype} vs {wc.dtype}")
                    continue
                if not gc.equals(wc):
                    diff = (gc != wc)
                    try:
                        idx = diff[diff].index[0]
                        msgs.append(f"col {c} differs at row {idx}: {gc[idx]!r} vs {wc[idx]!r}")
                    except Exception:
                        msgs.append(f"col {c} differs")
                    ok = False
        if ok:
            n_pass += 1
            print(f"  [PASS] {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: " + "; ".join(msgs))
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
