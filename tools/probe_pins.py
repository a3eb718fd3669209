#!/usr/bin/env python3
"""Static-plan pin audit from two FloorProbe sessions.

Usage: python3 tools/probe_pins.py probe_a.log probe_b.log [pins...]

Reads the PROBE lines (aqe_on / aqe_off arms) of both sessions and
prints, per query: the AQE-off minus AQE-on exec delta in each session
(negative = static plan faster), whether the two sessions agree on the
sign, and the verdict against the currently-pinned set — the
double-confirmation protocol BENCH_NOTES records each round:

  - pinned + both deltas negative   → KEEP
  - pinned + signs disagree/positive→ UNPIN candidate
  - unpinned + both deltas ≤ -0.04s → PIN candidate

The pin list is read from the command line (short ids); with none
given, only the per-query table is printed.
"""
import sys
from collections import defaultdict


def load(path):
    out = defaultdict(dict)  # name -> {arm: exec_sec}
    for line in open(path):
        if "PROBE\t" not in line:
            continue
        parts = line.split("PROBE\t", 1)[1].rstrip("\n").split("\t")
        if len(parts) < 4:
            continue
        arm, name, build, exc = parts[0], parts[1], parts[2], parts[3]
        out[name][arm] = float(exc)
    return out


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    pins = set(sys.argv[3:])
    keep, unpin, pin_cand = [], [], []
    print(f"{'query':<28} {'dA':>7} {'dB':>7} agree pinned verdict")
    for name in sorted(set(a) & set(b)):
        if "aqe_on" not in a[name] or "aqe_off" not in a[name]:
            continue
        if "aqe_on" not in b[name] or "aqe_off" not in b[name]:
            continue
        da = a[name]["aqe_off"] - a[name]["aqe_on"]
        db = b[name]["aqe_off"] - b[name]["aqe_on"]
        agree = (da < 0) == (db < 0)
        short = name.split("_")[0]
        pinned = short in pins
        verdict = ""
        if pinned and da < 0 and db < 0:
            verdict = "KEEP"
            keep.append(short)
        elif pinned:
            verdict = "UNPIN?"
            unpin.append(short)
        elif da <= -0.04 and db <= -0.04:
            verdict = "PIN?"
            pin_cand.append(short)
        print(f"{name:<28} {da:7.3f} {db:7.3f} {str(agree):<5} "
              f"{str(pinned):<6} {verdict}")
    if pins:
        print(f"\nKEEP {len(keep)}; UNPIN candidates: {','.join(unpin) or '-'}; "
              f"PIN candidates: {','.join(pin_cand) or '-'}")


if __name__ == "__main__":
    main()
