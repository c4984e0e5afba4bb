#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Mimics the driver: for each query result parquet written by
graft.Verify, run the matching oracle SQL in DuckDB over the same
testdata parquet tables, sort columns by name, sort rows, and compare
values. Reports per-query PASS/FAIL with a diff preview.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and tiny representation noise
        return round(v, 9) + 0.0
    if isinstance(v, int):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return str(v)


def canon(table):
    cols = sorted(table.column_names)
    rows = list(zip(*[[norm(v) for v in table.column(c).to_pylist()] for c in cols]))
    key = lambda r: tuple((x is None, str(x)) for x in r)
    return cols, sorted(rows, key=key)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
            want = con.execute(sql).arrow()
            gc, gr = canon(got)
            wc, wr = canon(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_fail += 1
            elif gr != wr:
                print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows")
                for i, (a, b) in enumerate(zip(gr, wr)):
                    if a != b:
                        print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                        break
                if len(gr) != len(wr):
                    only_g = [r for r in gr[:2000] if r not in wr[:2000]]
                    print(f"  sample spark-only: {only_g[:2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
