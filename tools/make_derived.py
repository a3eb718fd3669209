#!/usr/bin/env python3
"""Build the 10x derived scaling corpus (builder-side tool, python env).

Replicates the scaling tables K times under consistently-offset keys so the
join structure is preserved (each replica joins only within itself), keeps
the bounded dims (region, nation) unchanged. Used ONLY for scaling analysis
(BENCH_NOTES) - never for correctness, which runs on the driver corpus
exclusively.

documents/embeddings are copied by default (the r4/r5 chains' shape).
With --scale-docs they replicate too:
  - documents: doc_id offset per replica, and every WORD is prefixed with
    the replica tag (g0w, g1w, ...). A 1:1 word mapping preserves the
    within-replica shingle/near-dup structure EXACTLY while replicas share
    zero shingles - so dedup/LSH work scales linearly with K instead of
    exploding quadratically on K identical copies of every text, which is
    what a plain copy would do to every band bucket.
  - embeddings: vec_id offset per replica, values unchanged (scan/probe
    volume is what scales; the bounded-window queries only read replica 0).

Usage: python3 tools/make_derived.py <srcSfDir> <dstDir> [K=10] [--scale-docs]
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
    "doc_id": 1_000_000, "vec_id": 1_000_000,
}
SCALED = ["lineitem", "orders", "customer", "supplier", "part", "events"]
COPIED = ["region", "nation", "documents", "embeddings"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else 10
    scale_docs = "--scale-docs" in sys.argv
    scaled = SCALED + (["documents", "embeddings"] if scale_docs else [])
    copied = [t for t in COPIED if t not in scaled]
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in scaled:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]

        def expr(c):
            if c in OFFSETS:
                return f"{c} + g * {OFFSETS[c]} AS {c}"
            if t == "documents" and c == "text":
                # replica-tag every word: distinct shingle space per replica,
                # identical near-dup structure within each
                return ("array_to_string(list_transform(string_split(text, ' '), "
                        "w -> 'g' || g || w), ' ') AS text")
            return c
        sel = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({k}) r(g)) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0])
    for t in copied:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")


if __name__ == "__main__":
    main()
