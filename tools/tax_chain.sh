#!/bin/bash
# r10 interleave-tax decomposition: one box state, back-to-back arms.
# Attribution targets (VERDICT r9 item 1): plan-compile share, Janino
# recompile share (codegen cache eviction), residual JIT/scheduler floor.
# Artifacts land in $OUT (default /tmp/tax_r10): duck.json + one
# bench_detail per arm.
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tax_r10}
SF=${SF:-/root/testdata/sf0.1}
ORACLE=${ORACLE:-/tmp/verify_sf0001/oracle_sql.json}
mkdir -p "$OUT"
echo "== tax chain → $OUT (loadavg $(cut -d' ' -f1 /proc/loadavg)) =="

run_arm() { # name, env...
  local name=$1; shift
  echo "-- arm $name ($*) --"
  env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_DETAIL_OUT="$OUT/$name.json" \
    "$@" sbt -batch "runMain graft.Bench" \
    2>&1 | grep -oE '\{"metric".*' | tail -1 > "$OUT/${name}_stdout.json"
  python3 - "$OUT/$name.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
pm = d.get("pass_meta", [])
print(" total %.2f s; passes:" % d.get("total", -1),
      ["%.1fs gc=%dms jan=%dms" % (p.get("wall_s",-1), p.get("gc_ms",-1),
        p.get("janino_ms",-1)) for p in pm])
EOF
}

echo "-- duckdb sf0.1 (yardstick) --"
python3 tools/bench_duckdb.py "$SF" "$ORACLE" | tail -1 > "$OUT/duck.json"
python3 -c "import json;print(' duck total', json.load(open('$OUT/duck.json')).get('value'))"

run_arm stock  SPARK_GRAFT_CODEGEN_CACHE=100
run_arm cache  SPARK_GRAFT_CODEGEN_CACHE=5000
run_arm plan   SPARK_GRAFT_CODEGEN_CACHE=5000 SPARK_GRAFT_PHASE=plan
run_arm reuse  SPARK_GRAFT_CODEGEN_CACHE=5000 SPARK_GRAFT_REUSE=true
run_arm adj    SPARK_GRAFT_CODEGEN_CACHE=5000 SPARK_GRAFT_ORDER=adjacent
echo "== done → $OUT =="
