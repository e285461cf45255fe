#!/bin/bash
# Local replica of the driver's t2 correctness gate.
# Usage: tools/localverify.sh [sfDir] [query ...]
set -e
SF=${1:-/root/testdata/sf0.01}
shift || true
OUT=/tmp/verify_out
rm -rf "$OUT"
cd /root/repo
SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\]|error|Exception" || true
python3 tools/compare.py "$SF" "$OUT" "$@"
