#!/usr/bin/env bash
# Round-close gate (VERDICT r17 #1b): the last act before the close
# commit. Refuses to close when the stamp suite is red against the
# EXACT tree being committed, or when an evidence artifact the stamps
# read still differs from the index (i.e. would not ride the commit).
#
# Usage:  tools/close_round.sh          # stamp suite + artifact check
#         tools/close_round.sh --full   # full `sbt test` instead
#
# The r16 and r17 closes both shipped stale evidence (clobbered sweep;
# stale x10 crosscheck + stale bench) because the stamps were checked
# BEFORE the final artifact edits, not after. This script exists to
# make that ordering error loud: run it immediately before `git commit`,
# with everything already staged.
set -euo pipefail
cd "$(dirname "$0")/.."

ARTIFACTS=(SURVEY.md BENCH_LOCAL.json BASELINE_DUCKDB.json
           SCALE_SWEEP.json SCALE_SWEEP_DENSITY.json
           SCALE_CORRECTNESS.json SCALE_ANN.json)

# 1. every stamped artifact must be staged (unstaged edits would leave
#    the commit carrying stamps checked against a different tree)
dirty=$(git diff --name-only -- "${ARTIFACTS[@]}")
if [[ -n "$dirty" ]]; then
  echo "close_round: unstaged evidence artifacts — stage them first:" >&2
  echo "$dirty" >&2
  exit 1
fi

# 1b. unstaged SOURCE edits are the same ordering error from the other
#     side (ADVICE r18): sbt test would run against a working tree that
#     differs from the tree being committed, so a green gate here would
#     certify code the commit doesn't carry.
dirty_src=$(git diff --name-only -- src/ build.sbt tools/ project/)
if [[ -n "$dirty_src" ]]; then
  echo "close_round: unstaged source edits — the gate would test a tree" >&2
  echo "the commit doesn't carry; stage (or stash) these first:" >&2
  echo "$dirty_src" >&2
  exit 1
fi

# 2. the stamp suite (or the full suite with --full) against this tree
if [[ "${1:-}" == "--full" ]]; then
  sbt -batch test
else
  sbt -batch "testOnly graft.BenchStampSpec graft.ScaleStampSpec graft.CountsSpec graft.BenchHeadlineSpec"
fi

echo "close_round: OK — stamps green against the staged tree; commit now."
