#!/usr/bin/env python3
"""Bench regression gate (round-9 verdict item 7).

Compares per-query times of the two most recent BENCH_LOCAL_r*.json
archives (or two explicit paths) and exits nonzero when any query
regressed — RELATIVE TO THE RUN-LEVEL MEDIAN RATIO — more than
REL_GATE without a SCALE.md note naming it in the "Accepted bench
regressions" section.

Cohort normalization (round 11): the two archives usually come from
different days/VMs, and a uniformly busier (or slower) environment
shifts EVERY query by a common factor — round 10's driver artifact
was a uniform 1.38x of the builder's with zero real regressions, and
the judge adjudicated it by exactly this median-ratio test. A query is
flagged when cur > prev * median_ratio * REL_GATE (and the absolute
floor), i.e. when it moved AGAINST its cohort; a uniform shift flags
nothing but is printed loudly as UNIFORM-SHIFT (with the cross-run
canary ratio when both artifacts carry one — the canary is the same
trivial query every round, so its cross-run ratio estimates the pure
environment factor; a UNIFORM-SHIFT line NOT explained by the canary
is how an across-the-board code slowdown, like r10's periodicGC
config, surfaces for human adjudication and a SCALE.md note).

Per-file metric preference (round-11 verdict item 6): queries_p2min
(min of passes 2..n — artifact builds land in pass 1, so this is the
steady state) > queries_min > queries. Archives predating a field fall
back, so a cross-round diff may compare an old all-pass min against a
new steady-state min; p2min >= min, which only makes the gate stricter
on the newer side.

Noise canary (round-11 verdict item 2): Bench times a fixed trivial
scan at sweep start AND end (canary_start_sec / canary_end_sec, each
a min-of-3). The within-run end/start ratio is printed with the
summary and next to any flagged regression — a run whose canary
inflated mid-sweep is self-identifying as host interference.

Usage:
    scripts/bench_diff.py                 # two newest archives
    scripts/bench_diff.py PREV.json CUR.json

Gate: cur > prev * median_ratio * 1.5 AND cur - prev > 0.15s (the
absolute floor keeps sub-100ms queries from tripping on scheduler
noise; min-vs-min already filters most run-to-run variance).

Small-cohort degeneracy (round-12, ADVICE): with one shared query the
cohort median IS that query's own ratio, so the relative gate can
mathematically never fire on a targeted SPARK_GRAFT_ONLY diff; with
2-4 it is nearly as diluted. Below MIN_COHORT shared queries the
median is therefore forced to 1.0 (absolute gating) and a note is
printed.

Uncorroborated uniform shift (round-12): a slower-side UNIFORM-SHIFT
that the cross-run canary does NOT explain (canary moved less than
half the cohort shift, or the CURRENT run's canary failed) is the
signature of an across-the-board code slowdown — r10's periodicGC
class — and FAILS the gate unless SCALE.md's 'Accepted bench
regressions' section carries a list line starting with the token
`accept-uniform-shift` (bullet-anchored so prose MENTIONING the gate
can never silently waive it; like every line in that section it is a
standing waiver a later round must prune). A pre-r11 prev archive has
no canary to corroborate against; that case stays informational
(legacy comparisons only — every r11+ archive carries canaries).
"""
import json
import os
import re
import statistics
import sys
from pathlib import Path

REL_GATE = 1.5
ABS_FLOOR = 0.15       # seconds
UNIFORM_NOTE = 0.10    # |median_ratio - 1| beyond this prints UNIFORM-SHIFT
MIN_COHORT = 5         # below this, median normalization is disabled

REPO = Path(__file__).resolve().parent.parent
# test seam: scripts/test_bench_diff.sh injects a temp SCALE.md
SCALE_MD = Path(os.environ.get("BENCH_DIFF_SCALE_MD", REPO / "SCALE.md"))


def round_no(path):
    m = re.search(r"_r0*(\d+)\.json$", Path(path).name)
    return int(m.group(1)) if m else -1


# Marker for "the archive carries the field but the probe itself
# threw in-run" (Bench's -1.0 sentinel). Distinct from None, which
# means the archive PRE-DATES the field — conflating the two made
# axis_note print 'CURRENT probe FAILED in-run' when diffing a
# new-format prev against an older-format cur (round-16 ADVICE).
PROBE_FAILED = "probe-failed"


def axis_value(d, field):
    v = d.get(field)
    if v is None:
        return None
    # only a NEGATIVE value is the failure sentinel; a probe that
    # f3-rounds to 0.000 is a degenerate-but-real measurement
    return PROBE_FAILED if v < 0 else float(v)


def load(path):
    d = json.loads(Path(path).read_text())
    q = d.get("queries_p2min") or d.get("queries_min") or d.get("queries")
    if not q:
        sys.exit(f"bench_diff: {path} has no queries table")
    s, e = d.get("canary_start_sec"), d.get("canary_end_sec")
    cmin = min(s, e) if s and e and s > 0 and e > 0 else None
    return (q, s, e, cmin,
            axis_value(d, "floor_sec"), axis_value(d, "iter_sec"))


def canary_note(start, end):
    if start is None or end is None:
        return "canary: n/a (pre-r11 artifact)"
    if start <= 0 or end <= 0:
        # Bench writes -1.0 when a canary sample itself threw — that is
        # a run problem worth investigating, not an old file format
        return "canary: FAILED in-run (sentinel values)"
    return f"canary: start {start:.3f}s end {end:.3f}s ratio {end / start:.2f}"


def floor_note(prev_floor, cur_floor):
    """Cross-run per-job-latency floor (round-16, r15 verdict item 2).

    Bench's floor_sec is the median wall time of 10 trivial
    one-partition jobs — a direct measurement of the box's per-job
    scheduling latency, the axis the r15 host adjudication proved
    varies ~2x across fleet VMs while bulk throughput varies ~1.2x.
    Small-query movement that tracks the floor ratio is the box, not
    code; previously this had to be re-derived from q_wordcount's raw
    ratio by hand on every diff."""
    return axis_note("floor", "floor_sec", prev_floor, cur_floor)


def axis_note(label, field, prev_v, cur_v):
    # each side is a non-negative float, PROBE_FAILED (the archive
    # carries the field but that run's probe threw — the -1.0
    # sentinel, worth investigating), or None (the archive pre-dates
    # the field — a format gap, NOT a probe failure; round-16 ADVICE
    # had load() conflating the two, so a new-format prev diffed
    # against an older-format cur misprinted 'CURRENT probe FAILED')
    if prev_v is None and cur_v is None:
        return f"{label}: n/a"
    if isinstance(prev_v, float) and isinstance(cur_v, float) and prev_v > 0:
        return (f"{label}: prev {prev_v:.3f}s cur {cur_v:.3f}s "
                f"ratio {cur_v / prev_v:.2f}x")
    if prev_v is None and isinstance(cur_v, float):
        return (f"{label}: cur {cur_v:.3f}s "
                f"(prev archive pre-dates {field})")

    def part(which, v):
        if isinstance(v, float):
            return f"{which} {v:.3f}s"
        if v == PROBE_FAILED:
            side = "CURRENT" if which == "cur" else "PREV"
            return f"{side} probe FAILED in-run"
        return f"{which} archive lacks {field}"
    return f"{label}: " + ", ".join([part("prev", prev_v),
                                     part("cur", cur_v)])


def accepted_section(scale_md):
    """Body of SCALE.md's 'Accepted bench regressions' section."""
    text = Path(scale_md).read_text() if Path(scale_md).exists() else ""
    m = re.search(r"^##\s*Accepted bench regressions\s*$(.*?)(?=^##\s|\Z)",
                  text, re.M | re.S)
    return m.group(1) if m else ""


def accepted_names(scale_md):
    """Query names listed in the accepted section (one line per
    accepted trade, naming the query)."""
    return set(re.findall(r"\bq_[a-z0-9_]+\b", accepted_section(scale_md)))


def uniform_shift_waived(scale_md):
    """True when the accepted section carries a LIST line starting
    with `accept-uniform-shift`. Bullet-anchored on purpose: the
    section also holds narrative lines, and a prose mention of the
    gate's name ('the uniform-shift gate never fired') must not read
    as a standing waiver of the across-the-board-slowdown check."""
    return re.search(r"^\s*-\s*accept-uniform-shift\b",
                     accepted_section(scale_md), re.M) is not None


def main():
    if len(sys.argv) == 3:
        prev_p, cur_p = sys.argv[1], sys.argv[2]
    else:
        # numeric round order — lexicographic sorting would put r100
        # before r11 (round-11 ADVICE)
        archives = sorted(REPO.glob("BENCH_LOCAL_r*.json"), key=round_no)
        if len(archives) < 2:
            print("bench_diff: fewer than two archives — nothing to diff")
            return 0
        prev_p, cur_p = archives[-2], archives[-1]
    prev, p_start, p_end, prev_cmin, prev_floor, prev_iter = load(prev_p)
    cur, c_start, c_end, cur_cmin, cur_floor, cur_iter = load(cur_p)
    cnote = canary_note(c_start, c_end)
    # two latency axes (round-16 triage): the one-partition job floor
    # AND the shuffle+localCheckpoint per-round constant the iterative
    # family rides — they move independently on this VM family
    fnote = (floor_note(prev_floor, cur_floor) + "; " +
             axis_note("iter-floor", "iter_sec", prev_iter, cur_iter))
    accepted = accepted_names(SCALE_MD)

    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")

    shared = sorted(set(prev) & set(cur))
    # Bench records -1.0 for a query that failed every pass (and still
    # writes bench_last.json before exiting nonzero), so archives can
    # carry sentinels: they are not times — comparing them would skew
    # the median, flag every fixed query, and let a newly-broken query
    # sail under the c > p test. Newly-failing queries fail the gate
    # outright; recoveries are informational.
    newly_failing = [n for n in shared if prev[n] >= 0 > cur[n]]
    recovered = [n for n in shared if cur[n] >= 0 > prev[n]]
    comparable = [n for n in shared if prev[n] >= 0 and cur[n] >= 0]
    for n in recovered:
        print(f"recovered {n}: failed in prev, {cur[n]:.2f}s now")
    for n in newly_failing:
        print(f"REGRESS {n}: {prev[n]:.2f}s -> FAILED (ran in prev, "
              f"fails every pass now)")
    if not comparable:
        print("bench_diff: no comparable queries — nothing to gate")
        return 1 if newly_failing else 0
    raw_med = statistics.median(cur[n] / prev[n] for n in comparable)
    # below MIN_COHORT the median degenerates toward the flagged
    # query's own ratio (with exactly one query it IS that ratio and
    # the relative gate can never fire) — gate absolutely instead
    if len(comparable) < MIN_COHORT:
        print(f"small cohort ({len(comparable)} < {MIN_COHORT} shared "
              "queries): median normalization disabled, gating on "
              "absolute ratios")
        med = 1.0
    else:
        med = raw_med

    flagged, waived = [], []
    for name in comparable:
        p, c = prev[name], cur[name]
        if c > p * med * REL_GATE and c - p > ABS_FLOOR:
            (waived if name in accepted else flagged).append((name, p, c))

    for name, p, c in waived:
        print(f"waived  {name}: {p:.2f}s -> {c:.2f}s "
              f"({c / p:.1f}x, SCALE.md-accepted)")
    for name, p, c in flagged:
        print(f"REGRESS {name}: {p:.2f}s -> {c:.2f}s ({c / p:.1f}x vs "
              f"cohort median {med:.2f}x) — not named under SCALE.md "
              f"'## Accepted bench regressions' [{cnote}]")

    uniform_fail = False
    if abs(raw_med - 1.0) > UNIFORM_NOTE:
        prev_pre_r11 = p_start is None or p_end is None
        if prev_cmin and cur_cmin:
            cratio = cur_cmin / prev_cmin
            env = f"cross-run canary ratio {cratio:.2f}x"
            # corroborated = the canary (fixed code across rounds, so
            # its cross-run ratio estimates the pure environment
            # factor) moved at least half as far as the cohort; a
            # faster cohort needs no adjudication
            corroborated = (raw_med <= 1.0 or
                            cratio >= 1.0 + (raw_med - 1.0) / 2)
        else:
            # name WHICH side lacks a usable canary: a pre-r11 archive
            # simply predates the field, but a -1.0 sentinel means
            # that run's canary itself threw — exactly the case worth
            # investigating (round-12 ADVICE; round-17 review extended
            # the distinction to the CUR side too — an explicit-path
            # diff with an old artifact as cur is a format gap, not an
            # in-run failure)
            sides = []
            if prev_cmin is None:
                sides.append("prev archive pre-dates the canary"
                             if prev_pre_r11 else
                             "PREV canary FAILED in-run")
            if cur_cmin is None:
                sides.append("cur archive pre-dates the canary"
                             if c_start is None or c_end is None else
                             "CURRENT canary FAILED in-run")
            env = "no cross-run canary (" + "; ".join(sides) + ")"
            # only a pre-r11 prev is a legitimate reason to have
            # nothing to corroborate against (legacy comparison) —
            # and only when the CURRENT canary is itself usable: a
            # current-run canary that threw (-1 sentinel) must never
            # let a uniform slowdown pass as corroborated, whatever
            # the prev archive's age (round-12 ADVICE)
            corroborated = prev_pre_r11 and cur_cmin is not None
        print(f"UNIFORM-SHIFT: cohort median {raw_med:.2f}x across "
              f"{len(comparable)} shared queries ({env}; {fnote}) — "
              "an environment "
              "shift if the canary moved with it; otherwise an "
              "across-the-board code change needing a SCALE.md note")
        # the hard-fail is a COHORT property: on a small targeted diff
        # the "median" is one query's own ratio and the absolute
        # per-query gate above is the right (and sufficient) check
        if (raw_med > 1.0 + UNIFORM_NOTE and not corroborated
                and len(comparable) >= MIN_COHORT):
            # an across-the-board slowdown the canary does not explain
            # is r10's periodicGC class — machine-fail it unless
            # SCALE.md explicitly accepts it (bullet-anchored token)
            if uniform_shift_waived(SCALE_MD):
                print("UNIFORM-SHIFT waived: `- accept-uniform-shift` line "
                      "under SCALE.md '## Accepted bench regressions'")
            else:
                uniform_fail = True
                print("UNIFORM-SHIFT UNCORROBORATED: the cohort slowed "
                      f"{raw_med:.2f}x but the canary does not explain it "
                      "— failing the gate; if adjudicated as environment "
                      "or accepted, add a `- accept-uniform-shift — "
                      "<reason>` line under SCALE.md '## Accepted bench "
                      "regressions'")

    tp = sum(prev[n] for n in comparable)
    tc = sum(cur[n] for n in comparable)
    print(f"shared-query total: {tp:.1f}s -> {tc:.1f}s, "
          f"cohort median {raw_med:.2f}x ({prev_p} -> {cur_p}) "
          f"[{cnote}] [{fnote}]")
    if flagged or newly_failing or uniform_fail:
        print(f"bench_diff: {len(flagged) + len(newly_failing)} "
              "unexplained regression(s)" +
              (" + uncorroborated uniform shift" if uniform_fail else ""))
        return 1
    print("bench_diff: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
