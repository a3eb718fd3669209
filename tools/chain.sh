#!/bin/bash
# One within-chain A/B: Spark sf0.1, DuckDB sf0.1, Spark 10x, DuckDB 10x,
# back-to-back on the same box state. Artifacts land in $OUT (default
# /tmp/chain_<ts>): spark_sf01.json duck_sf01.json spark_10x.json
# duck_10x.json, plus the family-marginal table.
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/chain_$(date +%H%M%S)}
DERIVED=${DERIVED_DIR:-/tmp/derived10xdocs}
ORACLE=${ORACLE:-/tmp/verify_sf0001/oracle_sql.json}
# a "10x-docs" dir built without --scale-docs has 1x documents and makes
# the duck 10x leg incomparable (r11 trap) — regenerate unless docs are
# actually scaled (>10x the sf0.1 documents file)
SRC_DOCS=$(stat -c%s /root/testdata/sf0.1/documents.parquet)
if [ ! -f "$DERIVED/documents.parquet" ] || \
   [ "$(stat -c%s "$DERIVED/documents.parquet")" -le $((SRC_DOCS * 5)) ]; then
  echo "== regenerating $DERIVED with --scale-docs =="
  python3 tools/make_derived.py /root/testdata/sf0.1 "$DERIVED.new" 10 --scale-docs
  rm -rf "$DERIVED"; mv "$DERIVED.new" "$DERIVED"
fi
mkdir -p "$OUT"
echo "== chain → $OUT (loadavg $(cut -d' ' -f1 /proc/loadavg)) =="

echo "-- spark sf0.1 --"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_DETAIL_OUT="$OUT/spark_sf01.json" sbt -batch "runMain graft.Bench" \
  2>&1 | grep -oE '\{"metric".*' | tail -1 > "$OUT/spark_sf01_stdout.json"

echo "-- duckdb sf0.1 --"
python3 tools/bench_duckdb.py /root/testdata/sf0.1 "$ORACLE" \
  | tail -1 > "$OUT/duck_sf01.json"

echo "-- spark 10x --"
SPARK_GRAFT_SF_DIR="$DERIVED" \
  SPARK_GRAFT_DETAIL_OUT="$OUT/spark_10x.json" sbt -batch "runMain graft.Bench" \
  2>&1 | grep -oE '\{"metric".*' | tail -1 > "$OUT/spark_10x_stdout.json"

echo "-- duckdb 10x --"
python3 tools/bench_duckdb.py "$DERIVED" "$ORACLE" \
  | tail -1 > "$OUT/duck_10x.json"

echo "== family marginals =="
python3 tools/family_marginals.py "$OUT/spark_sf01.json" "$OUT/duck_sf01.json" \
  "$OUT/spark_10x.json" "$OUT/duck_10x.json" | tee "$OUT/marginals.txt"
for f in spark_sf01 duck_sf01 spark_10x duck_10x; do
  python3 -c "import json,sys; d=json.load(open('$OUT/$f.json')); \
print('$f total', round(d.get('total', d.get('value', 0)), 2))"
done
