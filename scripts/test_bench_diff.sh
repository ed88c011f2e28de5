#!/usr/bin/env bash
# Exercises bench_diff.py's round-11 additions: queries_p2min
# preference, cohort-median normalization, the UNIFORM-SHIFT
# annotation, the noise-canary annotation, and the regression exit
# path (explicit-path mode; archive discovery is covered by
# test_archive_guard.sh's ordering branch).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

fail() { echo "FAIL: $1"; exit 1; }

# prev: pre-r11 shape (queries_min only, no canary)
cat > "$TMP/prev.json" <<'EOF'
{"queries":{"q_a":9.0,"q_b":9.0,"q_c":9.0,"q_d":9.0},
 "queries_min":{"q_a":1.0,"q_b":1.0,"q_c":1.0,"q_d":1.0}}
EOF

# cur: r11 shape — queries_min shows a fake 2x regression on q_a that
# queries_p2min (the steady state) does NOT; the gate must prefer
# p2min and pass
cat > "$TMP/cur_ok.json" <<'EOF'
{"queries_min":{"q_a":2.0,"q_b":1.0,"q_c":1.0,"q_d":1.0},
 "queries_p2min":{"q_a":1.1,"q_b":1.0,"q_c":1.0,"q_d":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.33}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev.json" "$TMP/cur_ok.json")
echo "$out" | grep -q "bench_diff: OK" \
  || fail "p2min-clean run should pass the gate, got: $out"
echo "$out" | grep -q "canary: start 0.300s end 0.330s ratio 1.10" \
  || fail "canary annotation missing, got: $out"

# a REAL steady-state regression (p2min moved against a flat cohort)
# still fails, with the canary printed next to the flag
cat > "$TMP/cur_bad.json" <<'EOF'
{"queries_min":{"q_a":2.6,"q_b":1.0,"q_c":1.0,"q_d":1.0},
 "queries_p2min":{"q_a":2.5,"q_b":1.0,"q_c":1.0,"q_d":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
if out=$(python3 "$HERE/bench_diff.py" "$TMP/prev.json" "$TMP/cur_bad.json"); then
  fail "steady-state regression must exit nonzero, got: $out"
fi
echo "$out" | grep -q "REGRESS q_a: 1.00s -> 2.50s" \
  || fail "expected q_a flagged on p2min, got: $out"
echo "$out" | grep -q "REGRESS q_a.*canary" \
  || fail "canary must ride the REGRESS line, got: $out"

# a UNIFORM 1.3x shift (every query, canary included) is environment,
# not regression: nothing flagged, UNIFORM-SHIFT printed
cat > "$TMP/cur_uniform.json" <<'EOF'
{"queries_p2min":{"q_a":1.3,"q_b":1.3,"q_c":1.32,"q_d":1.28},
 "canary_start_sec":0.40,"canary_end_sec":0.41}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev.json" "$TMP/cur_uniform.json")
echo "$out" | grep -q "bench_diff: OK" \
  || fail "uniform shift must not flag queries, got: $out"
echo "$out" | grep -q "UNIFORM-SHIFT: cohort median 1.30x" \
  || fail "expected UNIFORM-SHIFT annotation, got: $out"

# ...but a query moving AGAINST an inflated cohort still fails: q_a at
# 2.6x while the cohort sits at 1.3x
cat > "$TMP/cur_mixed.json" <<'EOF'
{"queries_p2min":{"q_a":2.6,"q_b":1.3,"q_c":1.32,"q_d":1.28},
 "canary_start_sec":0.40,"canary_end_sec":0.41}
EOF
if out=$(python3 "$HERE/bench_diff.py" "$TMP/prev.json" "$TMP/cur_mixed.json"); then
  fail "against-cohort regression must exit nonzero, got: $out"
fi
echo "$out" | grep -q "REGRESS q_a" || fail "expected q_a flagged, got: $out"

# cross-run canary attribution: both archives carry canaries, the
# cohort shifted 1.3x and the canary shifted with it -> the
# UNIFORM-SHIFT line names the canary ratio
cat > "$TMP/prev_canary.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":1.0,"q_c":1.0,"q_d":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_canary.json" "$TMP/cur_uniform.json")
echo "$out" | grep -q "cross-run canary ratio 1.33x" \
  || fail "expected cross-run canary attribution, got: $out"

# failed-query sentinels (-1.0) are not times: a newly-FAILING query
# fails the gate by name; a RECOVERED query (prev -1.0, now real) must
# neither flag as a regression nor skew the median
cat > "$TMP/prev_sentinel.json" <<'EOF'
{"queries_p2min":{"q_a":-1.0,"q_b":1.0,"q_c":1.0,"q_d":1.0}}
EOF
cat > "$TMP/cur_sentinel.json" <<'EOF'
{"queries_p2min":{"q_a":0.5,"q_b":-1.0,"q_c":1.0,"q_d":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
if out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_sentinel.json" "$TMP/cur_sentinel.json"); then
  fail "newly-failing query must exit nonzero, got: $out"
fi
echo "$out" | grep -q "REGRESS q_b: 1.00s -> FAILED" \
  || fail "expected q_b flagged as newly failing, got: $out"
echo "$out" | grep -q "recovered q_a" \
  || fail "expected q_a reported as recovered, got: $out"
echo "$out" | grep -q "REGRESS q_a" \
  && fail "recovered q_a must not read as a regression: $out"

# two pre-r11 artifacts still diff on queries_min (fallback intact)
if out=$(python3 "$HERE/bench_diff.py" "$TMP/prev.json" "$TMP/prev.json"); then
  echo "$out" | grep -q "bench_diff: OK" || fail "self-diff should pass"
  echo "$out" | grep -q "canary: n/a" \
    || fail "pre-r11 artifact should report canary n/a, got: $out"
else
  fail "self-diff of a pre-r11 artifact must pass"
fi

# ── round-12: small-cohort degeneracy ──  a targeted one-query diff
# must still flag a large regression: with cohort normalization the
# single query's own ratio IS the median and the relative gate could
# never fire (round-12 ADVICE)
cat > "$TMP/prev_one.json" <<'EOF'
{"queries_p2min":{"q_a":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
cat > "$TMP/cur_one_bad.json" <<'EOF'
{"queries_p2min":{"q_a":3.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
if out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_one.json" "$TMP/cur_one_bad.json"); then
  fail "one-query 3x regression must exit nonzero, got: $out"
fi
echo "$out" | grep -q "small cohort (1 < 5 shared" \
  || fail "expected small-cohort note, got: $out"
echo "$out" | grep -q "REGRESS q_a: 1.00s -> 3.00s" \
  || fail "expected q_a flagged despite being the whole cohort, got: $out"

# ── round-12: uncorroborated uniform shift ──  a >=5-query cohort that
# uniformly slowed while the canary stayed flat is an across-the-board
# code slowdown (the periodicGC class) — fails without a SCALE.md token
cat > "$TMP/prev5.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":1.0,"q_c":1.0,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
cat > "$TMP/cur5_uniform_flat_canary.json" <<'EOF'
{"queries_p2min":{"q_a":1.3,"q_b":1.3,"q_c":1.32,"q_d":1.28,"q_e":1.3},
 "canary_start_sec":0.30,"canary_end_sec":0.31}
EOF
echo "## Accepted bench regressions" > "$TMP/scale_empty.md"
if out=$(BENCH_DIFF_SCALE_MD="$TMP/scale_empty.md" \
    python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/cur5_uniform_flat_canary.json"); then
  fail "uncorroborated uniform shift must exit nonzero, got: $out"
fi
echo "$out" | grep -q "UNIFORM-SHIFT UNCORROBORATED" \
  || fail "expected UNCORROBORATED failure, got: $out"

# ...the same shift WITH a canary that moved along is environment: OK
cat > "$TMP/cur5_uniform_canary_moved.json" <<'EOF'
{"queries_p2min":{"q_a":1.3,"q_b":1.3,"q_c":1.32,"q_d":1.28,"q_e":1.3},
 "canary_start_sec":0.40,"canary_end_sec":0.41}
EOF
out=$(BENCH_DIFF_SCALE_MD="$TMP/scale_empty.md" \
  python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/cur5_uniform_canary_moved.json") \
  || fail "canary-corroborated uniform shift must pass, got: $out"
echo "$out" | grep -q "bench_diff: OK" \
  || fail "corroborated shift should be OK, got: $out"

# ...and a bullet-anchored `- accept-uniform-shift` SCALE.md line waives it
cat > "$TMP/scale_waived.md" <<'EOF'
## Accepted bench regressions

- accept-uniform-shift — r12 test waiver line.
EOF
out=$(BENCH_DIFF_SCALE_MD="$TMP/scale_waived.md" \
  python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/cur5_uniform_flat_canary.json") \
  || fail "SCALE.md-waived uniform shift must pass, got: $out"
echo "$out" | grep -q "UNIFORM-SHIFT waived" \
  || fail "expected waiver note, got: $out"

# ...but PROSE merely mentioning the gate must NOT waive it: the token
# is bullet-anchored so a narrative line can't become a standing waiver
cat > "$TMP/scale_prose.md" <<'EOF'
## Accepted bench regressions

- r13: none (the accept-uniform-shift gate never fired; no
  uniform-shift was observed this round).
EOF
if out=$(BENCH_DIFF_SCALE_MD="$TMP/scale_prose.md" \
    python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/cur5_uniform_flat_canary.json"); then
  fail "a prose mention of the token must not waive the gate, got: $out"
fi
echo "$out" | grep -q "UNIFORM-SHIFT UNCORROBORATED" \
  || fail "expected UNCORROBORATED failure despite prose mention, got: $out"

# ── round-12: canary-side attribution ──  when the CURRENT run's
# canary failed in-run (-1.0 sentinels), the UNIFORM-SHIFT env note
# must say so instead of blaming a pre-r11 prev (round-12 ADVICE) —
# and an r11+ pair with a failed canary is uncorroborated -> fails
cat > "$TMP/cur5_uniform_failed_canary.json" <<'EOF'
{"queries_p2min":{"q_a":1.3,"q_b":1.3,"q_c":1.32,"q_d":1.28,"q_e":1.3},
 "canary_start_sec":-1.0,"canary_end_sec":-1.0}
EOF
if out=$(BENCH_DIFF_SCALE_MD="$TMP/scale_empty.md" \
    python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/cur5_uniform_failed_canary.json"); then
  fail "uniform shift with failed current canary must exit nonzero, got: $out"
fi
echo "$out" | grep -q "CURRENT canary FAILED in-run" \
  || fail "expected current-side canary attribution, got: $out"
echo "$out" | grep -q "pre-dates" \
  && fail "must not blame a pre-r11 prev when prev HAS a canary: $out"

# ── round-16: box-floor probe ──  both archives carry floor_sec ->
# the summary prints the cross-run floor ratio (the per-job-latency
# axis the r15 host adjudication proved) beside the canary; a prev
# archive pre-dating the field says so instead of inventing a ratio
cat > "$TMP/prev_floor.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":2.0,"q_c":1.5,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31,"floor_sec":0.050}
EOF
cat > "$TMP/cur_floor.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":2.0,"q_c":1.5,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31,"floor_sec":0.100}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_floor.json" "$TMP/cur_floor.json") \
  || fail "floor-carrying self-diff must pass, got: $out"
echo "$out" | grep -q "floor: prev 0.050s cur 0.100s ratio 2.00x" \
  || fail "expected cross-run floor ratio in summary, got: $out"
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/cur_floor.json") \
  || true
echo "$out" | grep -q "floor: cur 0.100s (prev archive pre-dates floor_sec)" \
  || fail "expected one-sided floor note for a pre-floor prev, got: $out"
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev5.json" "$TMP/prev5.json") \
  || fail "pre-floor self-diff must pass"
echo "$out" | grep -q "floor: n/a" \
  || fail "expected floor n/a on pre-floor archives, got: $out"
# ...and the floor note rides the UNIFORM-SHIFT line so shift
# adjudication sees the floor axis without hunting for it
cat > "$TMP/cur_floor_uniform.json" <<'EOF'
{"queries_p2min":{"q_a":1.3,"q_b":2.6,"q_c":1.95,"q_d":1.3,"q_e":1.3},
 "canary_start_sec":0.40,"canary_end_sec":0.41,"floor_sec":0.100}
EOF
out=$(BENCH_DIFF_SCALE_MD="$TMP/scale_empty.md" \
  python3 "$HERE/bench_diff.py" "$TMP/prev_floor.json" "$TMP/cur_floor_uniform.json") \
  || fail "corroborated uniform shift with floors must pass, got: $out"
echo "$out" | grep -q "UNIFORM-SHIFT: .*floor: prev 0.050s cur 0.100s ratio 2.00x" \
  || fail "expected floor note on the UNIFORM-SHIFT line, got: $out"

cat > "$TMP/cur_floor_failed.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":2.0,"q_c":1.5,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31,"floor_sec":-1.0}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_floor.json" "$TMP/cur_floor_failed.json") \
  || fail "failed-floor self-diff must still pass, got: $out"
echo "$out" | grep -q "floor: prev 0.050s, CURRENT probe FAILED in-run" \
  || fail "expected failed-current-probe floor attribution, got: $out"

# ── round-16: second axis ──  archives carrying iter_sec (the
# shuffle+localCheckpoint per-round constant) get the iter-floor note
# beside the floor note; archives pre-dating it say so
cat > "$TMP/prev_iter.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":2.0,"q_c":1.5,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31,
 "floor_sec":0.050,"iter_sec":0.200}
EOF
cat > "$TMP/cur_iter.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":2.0,"q_c":1.5,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31,
 "floor_sec":0.050,"iter_sec":0.500}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_iter.json" "$TMP/cur_iter.json") \
  || fail "iter-carrying self-diff must pass, got: $out"
echo "$out" | grep -q "iter-floor: prev 0.200s cur 0.500s ratio 2.50x" \
  || fail "expected cross-run iter-floor ratio, got: $out"
echo "$out" | grep -q "floor: prev 0.050s cur 0.050s ratio 1.00x" \
  || fail "floor note must still print beside iter-floor, got: $out"
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_floor.json" "$TMP/cur_iter.json") \
  || fail "pre-iter prev diff must pass, got: $out"
echo "$out" | grep -q "iter-floor: cur 0.500s (prev archive pre-dates iter_sec)" \
  || fail "expected one-sided iter-floor note, got: $out"

# ── round-17 (r16 ADVICE): key-absent vs -1.0 sentinel ──  a
# NEW-format prev diffed against an OLDER-format cur is a format gap
# on the cur side, not a probe failure — the note must say the cur
# archive lacks the field and must NOT print the FAILED attribution
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_iter.json" "$TMP/prev_floor.json") \
  || fail "new-prev/old-cur diff must pass, got: $out"
echo "$out" | grep -q "iter-floor: prev 0.200s, cur archive lacks iter_sec" \
  || fail "expected format-gap attribution for old-format cur, got: $out"
echo "$out" | grep -q "CURRENT probe FAILED" \
  && fail "format gap must not be attributed as a probe failure: $out"
# ...and a prev-side -1.0 sentinel names the PREV run's probe
cat > "$TMP/prev_floor_failed.json" <<'EOF'
{"queries_p2min":{"q_a":1.0,"q_b":2.0,"q_c":1.5,"q_d":1.0,"q_e":1.0},
 "canary_start_sec":0.30,"canary_end_sec":0.31,"floor_sec":-1.0}
EOF
out=$(python3 "$HERE/bench_diff.py" "$TMP/prev_floor_failed.json" "$TMP/cur_floor.json") \
  || fail "prev-failed-floor diff must pass, got: $out"
echo "$out" | grep -q "floor: PREV probe FAILED in-run, cur 0.100s" \
  || fail "expected failed-prev-probe floor attribution, got: $out"

echo "test_bench_diff: OK"
