#!/usr/bin/env python3
"""Time DuckDB executing each oracle SQL at a given scale factor — the
performance yardstick (BASELINE.md: DuckDB is both oracle and baseline).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [namePrefixes]
  namePrefixes: optional comma-separated query-name prefixes (e.g. "x") to
  time a subset — mirrors Bench's SPARK_GRAFT_ONLY knob for chain runs.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(oracle_path).read_text())
    if len(sys.argv) > 3:
        prefixes = tuple(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k.startswith(prefixes)}
    total = 0.0
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": times, "sf": sf_dir}))


if __name__ == "__main__":
    main()
