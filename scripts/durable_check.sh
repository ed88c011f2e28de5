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
assert b["durable_builds"] == 0, \
    f"second process rebuilt {b['durable_builds']} artifacts (expected 0)"
assert a["hashes"] == b["hashes"], "artifact reuse changed query results"
print(f"OK: process 1 built {a['durable_builds']} artifacts, process 2 "
      f"built 0, {len(a['hashes'])} query hashes identical")
EOF
