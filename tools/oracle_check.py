#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB over views named after
the parquet tables in <sf_dir>, and compares values with columns sorted
by name (the driver's documented compare). Reports per-query PASS/FAIL.

Dev tooling only — the Scala engine has no Python dependency.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got_rel.columns
            got = norm(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = norm(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            # show first diffs (in-order compare; also try set compare)
            as_set = sorted(map(repr, got)) == sorted(map(repr, exp))
            print(f"  set-equal={as_set} colorder={sorted(got_cols)}")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff at row {i}:\n    got {g}\n    exp {e}")
                    break
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
