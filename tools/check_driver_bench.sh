#!/usr/bin/env bash
# Round-START check (VERDICT r18 next-round #6): the driver re-runs the
# benchmark after every close and OVERWRITES BENCH_LOCAL.json in the
# worktree. The stamp suite's bands are supposed to survive that
# independent re-measurement — so verify it the moment a round opens,
# against the driver-refreshed artifact, before any code changes can
# muddy whose tree the stamps were checked on.
#
# Usage: tools/check_driver_bench.sh    # at round start, clean worktree
set -euo pipefail
cd "$(dirname "$0")/.."
echo "check_driver_bench: running stamp suite against the (possibly" \
     "driver-refreshed) worktree artifacts"
sbt -batch "testOnly graft.BenchStampSpec graft.BenchHeadlineSpec"
echo "check_driver_bench: OK — stamps hold under the driver's re-measurement."
