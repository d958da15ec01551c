#!/usr/bin/env bash
# Full pre-commit gauntlet: compile, specs, oracle parity, bench.
# Usage: tools/gauntlet.sh  (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + test =="
sbt -batch test 2>&1 | grep -E 'Tests:|error\]' | tail -3

echo "== verify + DuckDB oracle (sf0.01) =="
out=$(mktemp -d)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out" >/dev/null 2>&1
python3 tools/check.py /root/testdata/sf0.01 "$out" | tail -1

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"'
