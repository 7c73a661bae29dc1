#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
written by graft.Verify, run the oracle SQL in DuckDB over the same sf dir
and compare (schema-name-sorted, row-sorted) cell values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = f"{out_dir}/{name}"
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{pq}/*.parquet')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            gcols = sorted(got.column_names)
            wcols = sorted(want.column_names)
            if gcols != wcols:
                raise AssertionError(f"columns differ: got {gcols} want {wcols}")
            g = sorted(
                tuple(canon(r[c]) for c in gcols) for r in got.to_pylist())
            w = sorted(
                tuple(canon(r[c]) for c in wcols) for r in want.to_pylist())
            if len(g) != len(w):
                raise AssertionError(f"row count: got {len(g)} want {len(w)}")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    raise AssertionError(
                        f"row {i} differs:\n  got  {a}\n  want {b}")
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:
            msg = str(e).split(chr(10))
            print(f"FAIL {name}: " + " / ".join(msg[:4]))
            n_fail += 1
    # rows-only queries (no oracle): just report row counts
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM parquet_scan('{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {d.name}: {n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
