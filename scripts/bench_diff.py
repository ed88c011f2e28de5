#!/usr/bin/env python3
"""Bench regression gate (round-9 verdict item 7).

Compares the per-query best-pass (min) times of the two most recent
BENCH_LOCAL_r*.json archives (or two explicit paths) and exits
nonzero when any query regressed more than REL_GATE without a
SCALE.md note naming it in the "Accepted bench regressions" section.
Deliberate trades (e.g. the r8 q_triangles degree-orientation
skew-proofing) get a one-line entry there; anything else failing the
gate means an unexplained slowdown shipped.

Usage:
    scripts/bench_diff.py                 # two newest archives
    scripts/bench_diff.py PREV.json CUR.json

Gate: cur_min > prev_min * 1.5 AND cur_min - prev_min > 0.15s (the
absolute floor keeps sub-100ms queries from tripping on scheduler
noise; min-vs-min already filters most run-to-run variance).
"""
import json
import re
import sys
from pathlib import Path

REL_GATE = 1.5
ABS_FLOOR = 0.15  # seconds

REPO = Path(__file__).resolve().parent.parent


def load(path):
    d = json.loads(Path(path).read_text())
    q = d.get("queries_min") or d.get("queries")
    if not q:
        sys.exit(f"bench_diff: {path} has no queries_min/queries table")
    return q


def accepted_names(scale_md):
    """Query names listed in SCALE.md's 'Accepted bench regressions'
    section (one line per accepted trade, naming the query)."""
    text = Path(scale_md).read_text() if Path(scale_md).exists() else ""
    m = re.search(r"^##\s*Accepted bench regressions\s*$(.*?)(?=^##\s|\Z)",
                  text, re.M | re.S)
    if not m:
        return set()
    return set(re.findall(r"\bq_[a-z0-9_]+\b", m.group(1)))


def main():
    if len(sys.argv) == 3:
        prev_p, cur_p = sys.argv[1], sys.argv[2]
    else:
        archives = sorted(REPO.glob("BENCH_LOCAL_r*.json"))
        if len(archives) < 2:
            print("bench_diff: fewer than two archives — nothing to diff")
            return 0
        prev_p, cur_p = archives[-2], archives[-1]
    prev, cur = load(prev_p), load(cur_p)
    accepted = accepted_names(REPO / "SCALE.md")

    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")

    flagged, waived = [], []
    for name in sorted(set(prev) & set(cur)):
        p, c = prev[name], cur[name]
        if c > p * REL_GATE and c - p > ABS_FLOOR:
            (waived if name in accepted else flagged).append((name, p, c))

    for name, p, c in waived:
        print(f"waived  {name}: {p:.2f}s -> {c:.2f}s "
              f"({c / p:.1f}x, SCALE.md-accepted)")
    for name, p, c in flagged:
        print(f"REGRESS {name}: {p:.2f}s -> {c:.2f}s ({c / p:.1f}x) — "
              "not named under SCALE.md '## Accepted bench regressions'")

    tp = sum(prev[n] for n in set(prev) & set(cur))
    tc = sum(cur[n] for n in set(prev) & set(cur))
    print(f"shared-query total: {tp:.1f}s -> {tc:.1f}s "
          f"({prev_p} -> {cur_p})")
    if flagged:
        print(f"bench_diff: {len(flagged)} unexplained regression(s)")
        return 1
    print("bench_diff: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
