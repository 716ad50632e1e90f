#!/usr/bin/env bash
# Pre-snapshot gate: run before ANY end-of-round (or end-of-session) commit.
#
# Round 5 ended with a half-landed refactor committed unverified — HEAD did
# not compile, so the round's correctness and bench runs produced nothing.
# This script is the habit that prevents a repeat: a snapshot commit may only
# happen after it exits 0.
#
# Usage: scripts/preflight.sh [--full]
#   default : compile main + test sources (fast, ~10 s warm) — the minimum
#             bar for ANY commit.
#   --full  : also run the whole ScalaTest suite and the sf0.01 oracle
#             check — the bar for end-of-round snapshots.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch "Test/compile"

if [[ "${1:-}" == "--full" ]]; then
  sbt -batch test
  rm -rf /tmp/preflight_vout
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/preflight_vout"
  python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/preflight_vout
fi

echo "preflight OK"
