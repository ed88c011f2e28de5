#!/usr/bin/env bash
# Content-keyed bench archiver (round-10, verdict item 1).
#
# Round 9's archive was silently skipped because the old guard keyed
# on file mtime (`bench_last.json -nt $PREV`) and checkout/driver
# write timing defeated it — the brand-new regression gate then
# diffed r07->r08, one round stale. Mtimes are unreliable across
# git checkouts and driver writes; CONTENT is not:
#
#   * bench_last.json byte-identical to the NEWEST archive
#       -> this run is already archived; nothing to do.
#   * byte-identical to an OLDER archive
#       -> bench_last is stale (an old run's numbers); refuse to
#          relabel it AND exit nonzero — under presnap's `set -e`
#          that aborts the gate ("DO NOT SNAPSHOT"), because any
#          regression diff against stale numbers would be a
#          backwards two-round comparison.
#   * identical to no archive
#       -> a fresh bench run; archive it under the current round
#          (max CORRECTNESS_rNN + 1).
#
# Tested by scripts/test_archive_guard.sh (all three branches).
#
# Corroboration refusal (round-15, r14 verdict item 4): round 14's
# first archive attempt failed bench_diff's UNCORROBORATED
# uniform-shift gate and was discarded BY HAND — nothing stopped a
# future round from rotating an uncorroborated sweep into the ledger
# by forgetting the check. Before archiving fresh content, this
# script now diffs it against the newest archive and REFUSES the
# rotation when bench_diff prints `UNIFORM-SHIFT UNCORROBORATED`
# (cohort slowed, canary does not explain it, no SCALE.md waiver).
# Deliberate acceptance: BENCH_ACCEPT_UNCORROBORATED=1, or the
# standing `- accept-uniform-shift` SCALE.md bullet bench_diff
# already honors. Per-query regressions do NOT block the rotation —
# the archive IS the evidence the later presnap gate adjudicates.
set -euo pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "${1:-$SCRIPT_DIR/..}"

if [ ! -f bench_last.json ]; then
  echo "[archive_bench] no bench_last.json — nothing to archive"
  exit 0
fi

# guard the ls pipelines: under `set -euo pipefail` a no-match ls
# exits 1 and the pipefail propagates into the assignment
N=$( (ls CORRECTNESS_r*.json 2>/dev/null || true) \
  | sed 's/.*_r0*\([0-9]*\).json/\1/' | sort -n | tail -1 )
N=$(( ${N:-0} + 1 ))
DEST=$(printf 'BENCH_LOCAL_r%02d.json' "$N")
# version sort: plain `sort` puts r100 before r11 once rounds hit
# three digits, so NEWEST would pick the wrong archive (round-11
# ADVICE); -V compares the embedded round number numerically
NEWEST=$( (ls BENCH_LOCAL_r*.json 2>/dev/null || true) | sort -V | tail -1 )

MATCH=""
for f in BENCH_LOCAL_r*.json; do
  [ -e "$f" ] || continue
  if cmp -s bench_last.json "$f"; then MATCH="$f"; break; fi
done

if [ -z "$MATCH" ]; then
  # fresh numbers about to enter the round ledger: refuse an
  # UNCORROBORATED uniform shift (see header). bench_diff may exit
  # nonzero for OTHER reasons (per-query regressions, no queries
  # table in a minimal artifact) — only the uncorroborated token
  # blocks; everything else archives and is gated downstream.
  if [ -n "$NEWEST" ] && [ "${BENCH_ACCEPT_UNCORROBORATED:-0}" != "1" ]; then
    GATE_RC=0
    GATE_OUT=$(python3 "$SCRIPT_DIR/bench_diff.py" "$NEWEST" bench_last.json 2>&1) || GATE_RC=$?
    if printf '%s\n' "$GATE_OUT" | grep -q 'UNIFORM-SHIFT UNCORROBORATED'; then
      printf '%s\n' "$GATE_OUT"
      echo "[archive_bench] FATAL: refusing to rotate an UNCORROBORATED bench into $DEST — re-run on a quieter box, or accept deliberately via BENCH_ACCEPT_UNCORROBORATED=1 / a '- accept-uniform-shift' SCALE.md bullet"
      exit 1
    fi
    # The gate must not fail OPEN (round-16, r15 ADVICE): a nonzero
    # exit WITHOUT any bench_diff verdict marker means the gate itself
    # never ran to a verdict (missing python3, traceback on a
    # malformed archive) — the token grep above would see nothing and
    # an unvetted bench would rotate as if it had passed. Every path
    # through bench_diff that reaches a verdict prints a line starting
    # with 'bench_diff:' (OK / N regressions / no queries table /
    # fewer than two archives), so "rc!=0 and no such marker" is
    # exactly "the gate crashed". Per-query regressions and minimal
    # artifacts still archive — the archive IS the evidence the later
    # presnap gate adjudicates.
    if [ "$GATE_RC" -ne 0 ] && \
        ! printf '%s\n' "$GATE_OUT" | grep -q '^bench_diff:'; then
      printf '%s\n' "$GATE_OUT"
      echo "[archive_bench] FATAL: the corroboration gate itself failed (bench_diff rc=$GATE_RC, no verdict marker) — fix the gate (or accept deliberately via BENCH_ACCEPT_UNCORROBORATED=1) before archiving $DEST"
      exit 1
    fi
  fi
  if [ -e "$DEST" ]; then
    # a bench re-run within the same round: the new numbers become the
    # round's archive (they measure the round's final code), but the
    # earlier record must not be silently clobbered (round-11 ADVICE) —
    # rotate it into bench_archive/ (round-17, r16 verdict item 5:
    # superseded records live OUTSIDE the repo root AND outside the
    # BENCH_LOCAL_r*.json glob so the diff tooling never picks them up)
    mkdir -p "$(dirname "$DEST")/bench_archive"
    SUPERS="$(dirname "$DEST")/bench_archive/$(basename "$DEST")"
    i=1
    while [ -e "$SUPERS.superseded.$i" ]; do i=$((i+1)); done
    mv "$DEST" "$SUPERS.superseded.$i"
    echo "[archive_bench] same-round re-run: kept old archive as $SUPERS.superseded.$i"
  fi
  cp bench_last.json "$DEST"
  echo "[archive_bench] archived bench_last.json -> $DEST"
elif [ "$MATCH" = "$NEWEST" ]; then
  echo "[archive_bench] bench_last.json already archived as $MATCH"
else
  echo "[archive_bench] FATAL: bench_last.json matches OLDER archive $MATCH — stale bench; refusing to relabel as $DEST and failing the gate (re-run the bench)"
  exit 1
fi
