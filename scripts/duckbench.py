#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given scale factor — the
comparison side of Bench.scala's numbers for BASELINE.md.

Usage: python3 scripts/duckbench.py <sfDir> <oracle_sql.json> [out.json]

Warm process, per-query wall clock around .fetchall() (materialized,
like Spark's count()). One JSON line to stdout, same shape as bench.json.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duckbench.json"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    # warm: one trivial query so catalog/IO init is out of the timings
    con.execute("SELECT count(*) FROM lineitem").fetchall()
    times, errors = {}, {}
    for name in sorted(oracle):
        t0 = time.perf_counter()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 - record and continue
            times[name] = -1.0
            errors[name] = str(e)[:200]
    doc = {"metric": "total",
           "value": round(sum(v for v in times.values() if v >= 0), 3),
           "unit": "sec", "queries": times, "errors": errors, "sf": sf_dir}
    line = json.dumps(doc)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
