#!/usr/bin/env python3
"""Min-merge a fresh DuckDB baseline run into the committed
BASELINE_DUCKDB.json (round-close step 3).

The committed baseline is the STRICTEST observed DuckDB time per query
across quiet-host runs — a plain overwrite on a noisy host would
inflate our vs_baseline ratios and break round-over-round
comparability. Queries listed in --replace are REPLACED instead of
min-merged: their oracle SQL changed this round, so the old entry timed
a different query and is not comparable (r17: q_pnl_snapshots's grid
oracle -> delta oracle).

Usage: baseline_merge.py <fresh.json> <committed.json> [--replace q_a,q_b]
Writes the merge back to <committed.json> and prints a per-query delta
summary for entries that moved.
"""
import sys, json

fresh_path, committed_path = sys.argv[1], sys.argv[2]
replace = set()
if len(sys.argv) > 4 and sys.argv[3] == "--replace":
    replace = set(sys.argv[4].split(","))

fresh = json.load(open(fresh_path))
committed = json.load(open(committed_path))
ft, ct = fresh["times"], committed["times"]

merged, moved = {}, []
for name in sorted(set(ft) | set(ct)):
    if name in replace:
        if name in ft:
            merged[name] = ft[name]
            moved.append((name, ct.get(name), ft[name], "REPLACED"))
        # a replace-listed query missing from the fresh run is dropped:
        # its committed time measured SQL that no longer exists
        elif name in ct:
            moved.append((name, ct[name], None, "DROPPED (stale SQL)"))
    elif name in ft and name in ct:
        merged[name] = min(ft[name], ct[name])
        if ft[name] < ct[name]:
            moved.append((name, ct[name], ft[name], "min-merged"))
    elif name in ft:
        merged[name] = ft[name]
        moved.append((name, None, ft[name], "NEW"))
    else:
        merged[name] = ct[name]

out = dict(fresh)  # fresh engine version / threads / sf metadata
out["times"] = merged
out["aggregation"] = "min over independent quiet-host runs"
out["failed"] = fresh.get("failed", {})
with open(committed_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)

print(f"merged {len(merged)} entries -> {committed_path}")
for name, old, new, how in moved:
    print(f"  {how:22s} {name}: {old} -> {new}")
