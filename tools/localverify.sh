#!/bin/bash
# Local replica of the driver's t2 correctness gate.
# Usage: tools/localverify.sh [sfDir] [query ...]
# With query args, only those queries are dumped AND compared (fast
# iteration on one oracle); without, the full suite runs like the
# driver's own gate.
set -e
SF=${1:-/root/testdata/sf0.01}
shift || true
OUT=/tmp/verify_out
rm -rf "$OUT"
cd /root/repo
if [ $# -gt 0 ]; then
  SUBSET=$(IFS=,; echo "$*")
  export SPARK_GRAFT_VERIFY_QUERIES="$SUBSET"
fi
SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\]|error|Exception" || true
python3 tools/compare.py "$SF" "$OUT" "$@"
# plan-fingerprint gate (r12): static-plan drift fails loudly. The
# committed baseline is generated at sf0.01 — only gate at that rung
# (broadcast decisions legitimately differ at other scales).
if [ "$SF" = "/root/testdata/sf0.01" ] && [ -f PLAN_HASHES.json ]; then
  python3 tools/planhash_diff.py PLAN_HASHES.json "$OUT/plan_hashes.json" "$@"
fi
