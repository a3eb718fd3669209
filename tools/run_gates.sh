#!/bin/bash
# Full round gate in one command: tests + correctness (bit-exact DuckDB
# diff at both SFs) + bench. Exit nonzero on any failure.
set -eo pipefail
cd "$(dirname "$0")/.."
echo "== sbt test =="
sbt -batch test 2>&1 | grep -E "Tests:" | tail -1
echo "== verify sf0.001 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gates_sf0001" >/dev/null 2>&1
python3 tools/oracle_diff.py /root/testdata/sf0.001 /tmp/gates_sf0001 | tail -1
echo "== verify sf0.01 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gates_sf001" >/dev/null 2>&1
python3 tools/oracle_diff.py /root/testdata/sf0.01 /tmp/gates_sf001 | tail -1
echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep -oE '\{"metric".*' | tail -1
