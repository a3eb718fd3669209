#!/usr/bin/env python3
"""Time DuckDB executing each oracle SQL at a given scale factor — the
performance yardstick (BASELINE.md: DuckDB is both oracle and baseline).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [namePrefixes]
  namePrefixes: optional comma-separated query-name prefixes (e.g. "x") to
  time a subset — mirrors Bench's SPARK_GRAFT_ONLY knob for chain runs.
  DUCK_TIMEOUT_SEC env: per-statement wall cap — an exceeded statement is
  interrupted and recorded as -1 (DNF) instead of stalling the chain
  (r7 verdict item 5: 100x legs need measured-or-DNF, never extrapolated).
"""
import json
import os
import sys
import threading
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
    cap = float(os.environ.get("DUCK_TIMEOUT_SEC", "0"))
    total = 0.0
    dnf = 0
    times = {}
    for name in sorted(oracle):
        timer = None
        if cap > 0:
            timer = threading.Timer(cap, con.interrupt)
            timer.start()
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            times[name] = round(dt, 3)
            total += dt
        except duckdb.InterruptException:
            times[name] = -1.0  # DNF at the cap
            dnf += 1
        finally:
            if timer is not None:
                timer.cancel()
    out = {"metric": "duckdb_total", "value": round(total, 3),
           "unit": "sec", "queries": times, "sf": sf_dir}
    if cap > 0:
        out["timeout_sec"] = cap
        out["dnf"] = dnf
    print(json.dumps(out))


if __name__ == "__main__":
    main()
