#!/usr/bin/env python3
"""Compare two graft.Verify output directories query by query.

Usage: python3 tools/compare_runs.py <dirA> <dirB> [artifact.json]

Both dirs hold one parquet directory per query (what Verify writes). Rows
are compared column-name-sorted and row-sorted with the same
normalization as tools/oracle_diff.py — bit-exact on floats by design
(the Det contract makes results partition-count invariant, which is
exactly the claim a cluster-vs-local comparison certifies). Writes an
optional JSON artifact with per-query match flags.
"""
import json
import math
import sys
from pathlib import Path

import pyarrow.parquet as pq


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return str(v) if not isinstance(v, (int, bool)) else v


def canon(path):
    tbl = pq.read_table(path)
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main():
    dir_a, dir_b = Path(sys.argv[1]), Path(sys.argv[2])
    artifact = sys.argv[3] if len(sys.argv) > 3 else None
    names = sorted(p.name for p in dir_a.iterdir()
                   if p.is_dir() and not p.name.startswith("_"))
    results = {}
    n_pass = n_fail = 0
    for name in names:
        other = dir_b / name
        if not other.exists():
            print(f"MISS  {name}: absent in {dir_b}")
            results[name] = {"match": False, "err": "missing in B"}
            n_fail += 1
            continue
        try:
            ca, ra = canon(dir_a / name)
            cb, rb = canon(other)
        except Exception as e:
            print(f"ERR   {name}: {e}")
            results[name] = {"match": False, "err": str(e)}
            n_fail += 1
            continue
        if ca != cb:
            print(f"FAIL  {name}: columns {ca} vs {cb}")
            results[name] = {"match": False, "err": "schema"}
            n_fail += 1
        elif ra != rb:
            diff = next((i for i, (x, y) in enumerate(zip(ra, rb)) if x != y),
                        min(len(ra), len(rb)))
            print(f"FAIL  {name}: rows {len(ra)} vs {len(rb)}; first diff @{diff}")
            results[name] = {"match": False, "err": f"rows @{diff}"}
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(ra)} rows)")
            results[name] = {"match": True, "rows": len(ra)}
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if artifact:
        Path(artifact).write_text(json.dumps(
            {"pass": n_pass, "fail": n_fail, "queries": results}, indent=1))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
