#!/usr/bin/env bash
# Two-PROCESS durability proof for graft.engine.Scratch: the first sbt
# invocation builds every artifact into a shared GRAFT_SCRATCH_DIR, the
# second must rebuild NOTHING (durable_builds == 0) and return identical
# result hashes. Run from anywhere; takes an optional sf dir argument.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
SCRATCH=$(mktemp -d /tmp/graft_durable.XXXXXX)
trap 'rm -rf "$SCRATCH"' EXIT

run() {
  GRAFT_SCRATCH_DIR="$SCRATCH" sbt -batch "runMain graft.DurableCheck $SF_DIR" \
    | grep -o '{"durable_builds".*}' | tail -1
}

R1=$(run)
echo "process 1: $R1"
R2=$(run)
echo "process 2: $R2"

python3 - "$R1" "$R2" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert a["durable_builds"] > 0, "first process should have built artifacts"
# pinned build-once artifacts (round-11 verdict item 5): a cache-key
# edit that silently turns one back into a per-invocation rebuild must
# fail this proof BY NAME, not just by count — so the named checks run
# BEFORE the aggregate count assert (which would otherwise always fire
# first and reduce the diagnostic back to a bare number)
# round-12 (verdict item 4): beyond the round-10 amortizations, pin
# the tokenize+prefix artifacts (set-similarity family) and the
# bucketed co-purchase / graph-edge artifacts the graph suite rides
pinned = ["ivf_idx_full", "band_idx", "band_idx_all",
          "tok_sets", "tau_prefix",
          "bucketed_part_cooc_ms2", "bucketed_graph_edges",
          "bucketed_graph_ed"]
built1, built2 = set(a.get("built_prefixes", [])), set(b.get("built_prefixes", []))
missing = [p for p in pinned if p not in built1]
assert not missing, f"process 1 never built pinned artifacts: {missing}"
rebuilt = [p for p in pinned if p in built2]
assert not rebuilt, f"process 2 REBUILT pinned artifacts: {rebuilt}"
assert not built2, f"process 2 built artifacts: {sorted(built2)}"
assert b["durable_builds"] == 0, \
    f"second process rebuilt {b['durable_builds']} artifacts (expected 0)"
assert a["hashes"] == b["hashes"], "artifact reuse changed query results"
print(f"OK: process 1 built {a['durable_builds']} artifacts "
      f"({', '.join(sorted(built1))}), process 2 built 0 "
      f"(pinned {', '.join(pinned)}: builds=0), "
      f"{len(a['hashes'])} query hashes identical")
EOF
