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

# Durability drill + reference-scale throughput as ROUND-DEFAULT gates
# (round-13 verdict item 4): both passed every round they were run,
# but were only run when someone remembered — a regression in the
# artifact locking or a reference-workload crash would have sailed
# into a snapshot. Their one-line summaries are archived per round in
# GATES_LAST.txt (commit it with the snapshot). PRESNAP_FAST=1 skips
# them for mid-round iteration ONLY — never for the end-of-round run.
if [ "${PRESNAP_FAST:-0}" != "1" ]; then
  echo "[presnap] durability drill (sequential + concurrent)"
  bash scripts/durable_check.sh | tee /tmp/presnap_durable.log | grep '^OK'
  echo "[presnap] RefBench (reference-scale throughput)"
  sbt -batch "Test/runMain graft.RefBench" \
    | tee /tmp/presnap_refbench.log | grep -F '[refbench]'
  # archival formatting must not fail the gate (round-14 ADVICE):
  # gating already happened in the pipelines above; under pipefail a
  # log-shape drift (e.g. every refbench line a winner row) would
  # otherwise abort presnap AFTER the gates passed
  {
    echo "# gate summaries at $(git rev-parse --short HEAD) ($(date -u +%FT%TZ))"
    grep '^OK' /tmp/presnap_durable.log || true
    grep -F '[refbench]' /tmp/presnap_refbench.log | grep -v 'winner row' || true
  } > GATES_LAST.txt
else
  echo "[presnap] PRESNAP_FAST=1 — durability + RefBench SKIPPED (iteration only)"
fi

# Archive the current full-run bench as this round's local artifact
# (round-7 verdict item 5): the driver's BENCH_r*.json tail capture
# truncates (~68 of 269 queries visible at r7) and bench_last.json is
# overwritten every run, so round-over-round per-query diffs need an
# in-repo, round-numbered copy of the COMPLETE median+min table.
# Content-keyed (round-10 verdict item 1 — the r9 mtime guard
# misfired and silently skipped the archive): see archive_bench.sh,
# tested by test_archive_guard.sh.
bash scripts/archive_bench.sh

# Bench regression gate (round-9 verdict item 7): any query whose
# best-pass min regressed >1.5x and >0.15s vs the previous round
# must be named in SCALE.md "## Accepted bench regressions".
# Always diff the newest DISTINCT archive against bench_last.json
# itself (round-10 ADVICE: when the archive step skips, diffing the
# two newest archives would pass the gate with zero current-round
# evidence). If bench_last was just archived, the newest distinct
# archive is the previous round — exactly the intended comparison.
echo "[presnap] bench regression gate"
if [ -f bench_last.json ]; then
  GATE_PREV=""
  # -V: numeric round order — plain sort -r would scan r11 before r100
  for f in $( (ls BENCH_LOCAL_r*.json 2>/dev/null || true) | sort -rV ); do
    if ! cmp -s bench_last.json "$f"; then GATE_PREV="$f"; break; fi
  done
  if [ -n "$GATE_PREV" ]; then
    python3 scripts/bench_diff.py "$GATE_PREV" bench_last.json
  else
    echo "[presnap] no distinct prior archive — skipping bench gate"
  fi
else
  echo "[presnap] no bench_last.json — skipping bench gate"
fi

echo "[presnap] OK — safe to snapshot"
