#!/usr/bin/env bash
# Exercises all three branches of scripts/archive_bench.sh in a temp
# dir (round-10 verdict item 1 "Done =" condition: a stale
# bench_last.json still refuses to archive).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

fail() { echo "FAIL: $1"; exit 1; }

echo '{"round":1}' > "$TMP/CORRECTNESS_r01.json"
echo '{"pass_total_min": 100.0}' > "$TMP/BENCH_LOCAL_r01.json"

# 1. bench_last identical to the newest archive -> skip, no new file
cp "$TMP/BENCH_LOCAL_r01.json" "$TMP/bench_last.json"
out=$(bash "$HERE/archive_bench.sh" "$TMP")
echo "$out" | grep -q "already archived as BENCH_LOCAL_r01.json" \
  || fail "expected already-archived branch, got: $out"
[ ! -e "$TMP/BENCH_LOCAL_r02.json" ] || fail "identical bench was relabeled"

# 2. fresh content -> archived under the current round (r01 max + 1)
echo '{"pass_total_min": 95.0}' > "$TMP/bench_last.json"
out=$(bash "$HERE/archive_bench.sh" "$TMP")
echo "$out" | grep -q "archived bench_last.json -> BENCH_LOCAL_r02.json" \
  || fail "expected archive branch, got: $out"
cmp -s "$TMP/bench_last.json" "$TMP/BENCH_LOCAL_r02.json" \
  || fail "archived content differs"

# 3. stale bench_last (matches an OLDER archive) -> loud refusal AND
#    nonzero exit (presnap runs under set -e: DO NOT SNAPSHOT), even
#    though a newer round number is available
echo '{"round":2}' > "$TMP/CORRECTNESS_r02.json"
cp "$TMP/BENCH_LOCAL_r01.json" "$TMP/bench_last.json"
if out=$(bash "$HERE/archive_bench.sh" "$TMP"); then
  fail "stale bench must exit nonzero, got rc=0: $out"
fi
echo "$out" | grep -q "FATAL: bench_last.json matches OLDER archive BENCH_LOCAL_r01.json" \
  || fail "expected stale-refusal branch, got: $out"
[ ! -e "$TMP/BENCH_LOCAL_r03.json" ] || fail "stale bench was relabeled"

# 4. same-round re-run with DIFFERENT content -> old archive rotated
#    aside (into bench_archive/, outside the repo root AND the
#    r*.json glob — round-17, r16 verdict item 5), new numbers become
#    the round's archive (round-11 ADVICE: no silent clobber)
rm "$TMP/CORRECTNESS_r02.json"   # back to round 2 being current
echo '{"pass_total_min": 90.0}' > "$TMP/bench_last.json"
out=$(bash "$HERE/archive_bench.sh" "$TMP")
echo "$out" | grep -q "kept old archive as .*bench_archive/BENCH_LOCAL_r02.json.superseded.1" \
  || fail "expected supersede branch, got: $out"
cmp -s "$TMP/bench_last.json" "$TMP/BENCH_LOCAL_r02.json" \
  || fail "re-archived content differs"
grep -q '95.0' "$TMP/bench_archive/BENCH_LOCAL_r02.json.superseded.1" \
  || fail "superseded archive lost the old numbers"
[ ! -e "$TMP/BENCH_LOCAL_r02.json.superseded.1" ] \
  || fail "superseded file must not stay in the root"

# 5. round numbers >= 100 must order numerically. The regression case
#    is r11 vs r100: lexicographically "r100" < "r11" (char '0' < '1'),
#    so a plain sort calls r11 the NEWEST and a bench_last matching it
#    reads "already archived" — silently passing a STALE bench. Version
#    sort picks r100, so the r11 match is correctly FATAL-stale.
echo '{"round":100}' > "$TMP/CORRECTNESS_r100.json"
echo '{"pass_total_min": 85.0}' > "$TMP/BENCH_LOCAL_r11.json"
echo '{"pass_total_min": 80.0}' > "$TMP/BENCH_LOCAL_r100.json"
cp "$TMP/BENCH_LOCAL_r11.json" "$TMP/bench_last.json"
if out=$(bash "$HERE/archive_bench.sh" "$TMP"); then
  fail "r11-stale bench with r100 present must exit nonzero, got: $out"
fi
echo "$out" | grep -q "FATAL: bench_last.json matches OLDER archive BENCH_LOCAL_r11.json" \
  || fail "expected r11 stale refusal (lexicographic sort would call it newest), got: $out"

# 6. corroboration refusal (round-15): fresh content whose cohort is
#    uniformly ~2x the newest archive with a FLAT canary is bench_diff's
#    UNIFORM-SHIFT UNCORROBORATED case — the rotation must refuse
#    (nonzero, no new archive) unless deliberately accepted via
#    BENCH_ACCEPT_UNCORROBORATED=1.
TMP2=$(mktemp -d)
trap 'rm -rf "$TMP" "$TMP2"' EXIT
: > "$TMP2/SCALE_EMPTY.md"   # no standing waiver in the test seam
q_prev='"q_a":1.0,"q_b":1.0,"q_c":1.0,"q_d":1.0,"q_e":1.0,"q_f":1.0'
q_cur='"q_a":2.0,"q_b":2.0,"q_c":2.0,"q_d":2.0,"q_e":2.0,"q_f":2.0'
echo '{"round":1}' > "$TMP2/CORRECTNESS_r01.json"
echo "{\"queries_p2min\":{$q_prev},\"canary_start_sec\":0.1,\"canary_end_sec\":0.1}" \
  > "$TMP2/BENCH_LOCAL_r01.json"
echo "{\"queries_p2min\":{$q_cur},\"canary_start_sec\":0.1,\"canary_end_sec\":0.1}" \
  > "$TMP2/bench_last.json"
if out=$(BENCH_DIFF_SCALE_MD="$TMP2/SCALE_EMPTY.md" \
    bash "$HERE/archive_bench.sh" "$TMP2"); then
  fail "uncorroborated uniform shift must refuse to archive, got rc=0: $out"
fi
echo "$out" | grep -q "refusing to rotate an UNCORROBORATED bench" \
  || fail "expected corroboration refusal, got: $out"
[ ! -e "$TMP2/BENCH_LOCAL_r02.json" ] \
  || fail "uncorroborated bench was archived despite refusal"
# deliberate acceptance overrides
out=$(BENCH_DIFF_SCALE_MD="$TMP2/SCALE_EMPTY.md" BENCH_ACCEPT_UNCORROBORATED=1 \
  bash "$HERE/archive_bench.sh" "$TMP2")
echo "$out" | grep -q "archived bench_last.json -> BENCH_LOCAL_r02.json" \
  || fail "override must archive, got: $out"
# and a corroborated shift (canary moved with the cohort) never blocks
rm "$TMP2/BENCH_LOCAL_r02.json"
echo "{\"queries_p2min\":{$q_cur},\"canary_start_sec\":0.2,\"canary_end_sec\":0.2}" \
  > "$TMP2/bench_last.json"
out=$(BENCH_DIFF_SCALE_MD="$TMP2/SCALE_EMPTY.md" \
  bash "$HERE/archive_bench.sh" "$TMP2")
echo "$out" | grep -q "archived bench_last.json -> BENCH_LOCAL_r02.json" \
  || fail "canary-corroborated shift must archive, got: $out"

# 7. gate fail-OPEN refusal (round-16, r15 ADVICE): when bench_diff
#    itself crashes before reaching a verdict (here: a malformed
#    newest archive -> JSON traceback, no 'bench_diff:' marker), the
#    token grep sees no UNCORROBORATED line — the old `|| true` would
#    have archived an unvetted bench as if it had passed. Must refuse
#    (nonzero, no new archive); BENCH_ACCEPT_UNCORROBORATED=1 skips
#    the gate entirely and still archives.
TMP3=$(mktemp -d)
trap 'rm -rf "$TMP" "$TMP2" "$TMP3"' EXIT
echo '{"round":1}' > "$TMP3/CORRECTNESS_r01.json"
echo 'not json at all' > "$TMP3/BENCH_LOCAL_r01.json"
echo '{"queries_p2min":{"q_a":1.0},"canary_start_sec":0.1,"canary_end_sec":0.1}' \
  > "$TMP3/bench_last.json"
if out=$(bash "$HERE/archive_bench.sh" "$TMP3" 2>&1); then
  fail "crashed gate must refuse to archive, got rc=0: $out"
fi
echo "$out" | grep -q "corroboration gate itself failed" \
  || fail "expected gate-itself-failed refusal, got: $out"
[ ! -e "$TMP3/BENCH_LOCAL_r02.json" ] \
  || fail "bench was archived though the gate never reached a verdict"
out=$(BENCH_ACCEPT_UNCORROBORATED=1 bash "$HERE/archive_bench.sh" "$TMP3")
echo "$out" | grep -q "archived bench_last.json -> BENCH_LOCAL_r02.json" \
  || fail "deliberate override must archive past a crashed gate, got: $out"
# ...while a verdict-reaching nonzero exit (minimal artifact: the
# 'no queries table' path) still archives — the archive IS the
# evidence the later presnap gate adjudicates (branches 2/4/5 above
# also cover this; this pins it against the new refusal directly)
rm "$TMP3/BENCH_LOCAL_r02.json"
echo '{"pass_total_min": 42.0}' > "$TMP3/bench_last.json"
echo '{"queries_p2min":{"q_a":1.0},"canary_start_sec":0.1,"canary_end_sec":0.1}' \
  > "$TMP3/BENCH_LOCAL_r01.json"
out=$(bash "$HERE/archive_bench.sh" "$TMP3")
echo "$out" | grep -q "archived bench_last.json -> BENCH_LOCAL_r02.json" \
  || fail "a verdict-reaching nonzero gate must still archive, got: $out"

echo "test_archive_guard: OK (7/7 branches)"
