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

# Archive the current full-run bench as this round's local artifact
# (round-7 verdict item 5): the driver's BENCH_r*.json tail capture
# truncates (~68 of 269 queries visible at r7) and bench_last.json is
# overwritten every run, so round-over-round per-query diffs need an
# in-repo, round-numbered copy of the COMPLETE median+min table.
# Round = max driver correctness round + 1 (CORRECTNESS_rNN appears
# at the START of round NN+1).
if [ -f bench_last.json ]; then
  # guard the ls pipeline: under `set -euo pipefail` a no-match ls
  # exits 1 and the pipefail propagates into the assignment, aborting
  # the whole gate ("DO NOT SNAPSHOT") on a fully-passing first round
  N=$( (ls CORRECTNESS_r*.json 2>/dev/null || true) \
    | sed 's/.*_r0*\([0-9]*\).json/\1/' | sort -n | tail -1 )
  N=$(( ${N:-0} + 1 ))
  DEST=$(printf 'BENCH_LOCAL_r%02d.json' "$N")
  PREV=$( (ls BENCH_LOCAL_r*.json 2>/dev/null || true) | sort | tail -1 )
  # only archive a bench newer than the last archive — a stale
  # bench_last.json from an older run must not be relabeled as the
  # current round's numbers
  if [ -z "$PREV" ] || [ bench_last.json -nt "$PREV" ]; then
    cp bench_last.json "$DEST"
    echo "[presnap] archived bench_last.json -> $DEST"
  else
    echo "[presnap] bench_last.json not newer than $PREV — skipping archive"
  fi
fi

# Bench regression gate (round-9 verdict item 7): any query whose
# best-pass min regressed >1.5x and >0.15s vs the previous archive
# must be named in SCALE.md "## Accepted bench regressions".
echo "[presnap] bench regression gate"
python3 scripts/bench_diff.py

echo "[presnap] OK — safe to snapshot"
