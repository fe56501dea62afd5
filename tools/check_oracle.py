#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Spark
result parquet from Verify's outDir, run the matching oracle SQL in
DuckDB against the same sf tables, and compare values (columns sorted
by name, rows compared in emitted order, NaN==NaN).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got_rel.columns
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            n_fail += 1
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows", end="")
            diffs = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
            if diffs:
                i = diffs[0]
                print(f"; first diff row {i}:\n  got {got[i]}\n  exp {exp[i]}")
            else:
                print()
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
