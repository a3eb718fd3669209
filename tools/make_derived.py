#!/usr/bin/env python3
"""Build the 10x derived scaling corpus (builder-side tool, python env).

Replicates the scaling tables K times under consistently-offset keys so the
join structure is preserved (each replica joins only within itself), keeps
the bounded dims (region, nation) and the documents/embeddings corpora
unchanged. Used ONLY for scaling analysis (BENCH_NOTES) - never for
correctness, which runs on the driver corpus exclusively.

Usage: python3 tools/make_derived.py <srcSfDir> <dstDir> [K=10]
"""
import sys
from pathlib import Path

import duckdb

# key-column -> per-replica offset (consistent across tables so FKs line up)
OFFSETS = {
    "l_orderkey": 10_000_000, "o_orderkey": 10_000_000,
    "l_partkey": 1_000_000, "p_partkey": 1_000_000,
    "l_suppkey": 100_000, "s_suppkey": 100_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "event_id": 10_000_000, "user_id": 100_000,
}
SCALED = ["lineitem", "orders", "customer", "supplier", "part", "events"]
COPIED = ["region", "nation", "documents", "embeddings"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in SCALED:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + g * {OFFSETS[c]} AS {c}" if c in OFFSETS else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({k}) r(g)) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0])
    for t in COPIED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")


if __name__ == "__main__":
    main()
