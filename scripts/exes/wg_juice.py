#!/usr/bin/env python3
"""Web-graph juice (streaming reducer contract): stdin `key,value`
lines sorted by key; emit `key,count` per key — in-degree count."""
import sys

cur, cnt = None, 0
for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    key = line.split(",", 1)[0]
    if key == cur:
        cnt += 1
    else:
        if cur is not None:
            print(f"{cur},{cnt}")
        cur, cnt = key, 1
if cur is not None:
    print(f"{cur},{cnt}")
