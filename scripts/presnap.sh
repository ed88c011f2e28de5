#!/usr/bin/env bash
# Pre-snapshot guard (round-6 verdict item 4): round 5's entire
# external signal (CORRECTNESS_r05 0/0, BENCH_r05 rc=1) died on a
# one-character compile break that was never compiled before snapshot.
# Run this before ANY end-of-round commit:
#
#   scripts/presnap.sh            # compile + verify + oracle-check at sf0.001
#   scripts/presnap.sh sf0.01     # heavier gate at sf0.01
#
# Exit nonzero = DO NOT SNAPSHOT.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-sf0.001}"
SF_DIR="/root/testdata/$SF"
OUT_DIR="/tmp/presnap_verify_$SF"

echo "[presnap] sbt compile + Test/compile"
sbt -batch -error compile Test/compile

echo "[presnap] Verify at $SF_DIR"
rm -rf "$OUT_DIR"
sbt -batch -error "runMain graft.Verify $SF_DIR $OUT_DIR"

echo "[presnap] oracle check"
python3 scripts/check.py "$SF_DIR" "$OUT_DIR"

echo "[presnap] OK — safe to snapshot"
