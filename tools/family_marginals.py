#!/usr/bin/env python3
"""Family marginals from a within-chain A/B (sf0.1 + 10x, both engines).

Usage:
  python3 tools/family_marginals.py spark_sf01.json duck_sf01.json \
      spark_10x.json duck_10x.json

Inputs are bench artifacts: Bench's bench_detail.json (key "queries",
full query names) or bench_duckdb.py stdout JSON (same shape). Prints the
family table BENCH_NOTES records each round: per family, Spark/DuckDB
seconds at each scale and the marginal ratio Δspark/Δduck — the
data-cost growth comparison that the per-query floor cancels out of.

Family membership is pinned HERE so rounds are comparable; a query
missing from any input is skipped (and listed) rather than zeroed.
"""
import json
import sys
from pathlib import Path

FAMILIES = {
    "agg/groupby": ["q01", "q06", "q11", "q12", "q13", "q14", "q22", "q25",
                    "q26", "q28", "q29", "q38", "q55", "q57", "q59"],
    "join": ["q03", "q04", "q05", "q07", "q08", "q09", "q23", "q33",
             "q44", "x16", "x38"],
    "window": ["q16", "q17", "q18", "q36", "q45", "q51", "q54", "q56",
               "q58", "q58b"],
    "set-ops/recursive": ["q10", "q50"],
    "dedup-docs": ["x01", "x02", "x03", "x04", "x19", "x20", "x34"],
    "scan/function": ["q02", "q15", "q19", "q20", "q21", "q30", "q31",
                      "q32", "q35", "q41", "q42"],
}


def load(path):
    data = json.loads(Path(path).read_text())
    qs = data.get("queries", data)
    # short-id keys (Bench stdout) and full-name keys (bench_detail /
    # duckdb) both resolve: index by short id prefix
    out = {}
    for k, v in qs.items():
        short = k.split("_")[0]
        out[short] = out.get(short, 0.0) + float(v)
    return out


def main():
    s01, d01, s10, d10 = (load(p) for p in sys.argv[1:5])
    missing = set()
    print(f"{'family':<20} {'sf0.1 s/d':>12} {'10x s/d':>12} "
          f"{'s.marg':>7} {'d.marg':>7} {'ratio':>6}")
    for fam, qs in FAMILIES.items():
        have = [q for q in qs if all(q in m for m in (s01, d01, s10, d10))]
        missing.update(set(qs) - set(have))
        ss01 = sum(s01[q] for q in have)
        sd01 = sum(d01[q] for q in have)
        ss10 = sum(s10[q] for q in have)
        sd10 = sum(d10[q] for q in have)
        sm, dm = ss10 - ss01, sd10 - sd01
        ratio = sm / dm if dm > 0 else float("inf")
        print(f"{fam:<20} {ss01:5.2f}/{sd01:<5.2f} {ss10:6.2f}/{sd10:<6.2f}"
              f" {sm:7.2f} {dm:7.2f} {ratio:6.2f}")
    tot = [sum(m.values()) for m in (s01, d01, s10, d10)]
    print(f"{'TOTAL (all queries)':<20} {tot[0]:5.1f}/{tot[1]:<5.1f} "
          f"{tot[2]:6.1f}/{tot[3]:<6.1f}")
    if missing:
        print("skipped (absent from an input):", ",".join(sorted(missing)))


if __name__ == "__main__":
    main()
