#!/usr/bin/env python3
"""Web-graph maple (streaming contract): stdin edge lines `from,to`,
keep targets in [lo, hi] (argv, default 1..3 like the reference's
wg_maple.py), emit `to,from`."""
import sys

lo = int(sys.argv[1]) if len(sys.argv) > 1 else 1
hi = int(sys.argv[2]) if len(sys.argv) > 2 else 3

for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    parts = line.split(",")
    if len(parts) != 2:
        continue
    src, dst = parts[0].strip(), parts[1].strip()
    try:
        target = int(dst)
    except ValueError:
        continue
    if lo <= target <= hi:
        print(f"{dst},{src}")
