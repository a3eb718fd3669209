#!/usr/bin/env python3
"""Dev-loop oracle diff: mimic the driver's correctness gate locally.

Usage: python3 tools/oracle_diff.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf parquet tables,
and compares values column-name-sorted, row-sorted. Prints PASS/FAIL per
query. This is a builder-side tool only (driver-side python env).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # BIT-EXACT on purpose: the Det contract (decimal sums, sequential
        # folds, shared rounding) makes every oracle query identical to the
        # last bit — verified 56/56 at sf0.01. Keep the gate strict so any
        # new float-nondeterminism fails loudly here before the driver.
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return str(v) if not isinstance(v, (int, bool)) else v


def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"MISS  {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(spark_path)
            s_cols = tbl.column_names
            s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        dc, dr = canon(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: columns spark={sc} duckdb={dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            diff = next((i for i, (a, b) in enumerate(zip(sr, dr)) if a != b),
                        min(len(sr), len(dr)))
            print(f"FAIL  {name}: rows spark={len(sr)} duckdb={len(dr)}; "
                  f"first diff @{diff}:")
            print(f"      spark : {sr[diff] if diff < len(sr) else '<none>'}")
            print(f"      duckdb: {dr[diff] if diff < len(dr) else '<none>'}")
        else:
            print(f"PASS  {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
