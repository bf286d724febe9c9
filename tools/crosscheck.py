#!/usr/bin/env python3
"""Local pre-validation of oracle parity (mimics the driver's t2 gate):
runs each oracle_sql.json query in DuckDB over the sf tables and
compares against the Spark-written parquet, column-name-sorted,
row-sorted, exact values."""
import sys, os, json, glob, threading
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
# Optional per-oracle watchdog (duckdb_baseline.py's mechanism) for the
# x10 scale-point crosscheck: some gate oracles are quadratic by design
# and would hang the sweep; a timed-out oracle is reported as TIMEOUT,
# never silently passed. Unset (default) = no timeout, driver behavior.
timeout_s = float(os.environ.get("CROSSCHECK_TIMEOUT", "0")) or None
# Opt-in relative float tolerance (x10 scale-point runs): 0 = bit-exact,
# the driver-gate default.
float_rtol = float(os.environ.get("CROSSCHECK_FLOAT_RTOL", "0"))
# Opt-in oracle skip list, "name:reason;name:reason" — for oracles PROVEN
# infeasible on this host (q_pnl_snapshots at x10 exhausts DuckDB's spill
# disk, and interrupting it mid-spill deadlocks the connection). Skips are
# recorded in the artifact with their reason, never silently dropped.
# Entries split on ';' so a reason may contain commas (the r16 artifact's
# skip reason was truncated mid-sentence at a comma); ',' still accepted
# as a fallback separator for reason-free lists.
_skip_raw = os.environ.get("CROSSCHECK_SKIP", "")
skipped = dict(kv.split(":", 1) for kv in
               _skip_raw.split(";" if ";" in _skip_raw else ",") if ":" in kv)
def connect():
    c = duckdb.connect()
    # Bound the buffer pool well under physical RAM and give temp state
    # a disk spill dir: at the x10 point the 166-oracle sweep twice died
    # with process-level bad_alloc (r19: once at the initial connect,
    # once at a recycle) when the default 80%-of-RAM limit let the pool
    # balloon against the host's other consumers.
    c.execute(f"SET memory_limit='{os.environ.get('CROSSCHECK_MEM', '32GB')}'")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        # Spark writers (BuildScaled's x10 tables) produce DIRECTORIES
        # named <table>.parquet; the driver's testdata is single files.
        src = f"{f}/*.parquet" if os.path.isdir(f) else f
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return c

con = connect()
# Reconnect every N oracles: a single connection accumulates buffer-pool
# and temp state across 163 queries and eventually fails allocation on
# the x10 tables (q_text_quality OOM'd at 16 KB after ~150 big oracles,
# then ran alone in 0.9 s). View creation is metadata-only, so the
# recycle is free.
RECYCLE_EVERY = 10

def recycle(old):
    """Close + reconnect with a gc in between; an allocation failure
    during the reconnect itself gets one gc+retry before surfacing
    (the r19 failure mode: the fresh connect died with bad_alloc while
    freed buffers were still being returned)."""
    import gc, time as _t
    try:
        old.close()
    except Exception:
        pass
    gc.collect()
    try:
        return connect()
    except Exception as e:
        print(f"[crosscheck] reconnect failed ({str(e)[:120]}); retrying in 10s",
              file=sys.stderr, flush=True)
        gc.collect(); _t.sleep(10)
        return connect()

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
timed_out = []
since_recycle = 0
def check_one(name, sql):
    """Run one oracle on the current connection and compare against the
    Spark dump. Returns 'ok' | 'timeout' | ('bad', why). Raises
    duckdb.OutOfMemoryException through to the caller for the
    recycle-and-retry path."""
    done = threading.Event()
    if timeout_s:
        def watchdog(done=done):  # bind THIS query's event, not the
            # loop variable a late-starting thread would re-resolve
            if not done.wait(timeout_s):
                con.interrupt()
        threading.Thread(target=watchdog, daemon=True).start()
    try:
        want = con.sql(sql).df()
    except duckdb.InterruptException:
        return 'timeout'
    finally:
        done.set()
    got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        return ('bad', f"cols want={list(want.columns)} got={list(got.columns)}")
    # dtype-kind-strict: the driver hashes serialized values, so a
    # DuckDB HUGEINT (object/float in pandas) vs Spark BIGINT (int64)
    # FAILS there (123.0 vs 123) even when numerically equal — but
    # int32 vs int64 both print "123" and pass. Compare the pandas
    # dtype *kind* (int / float / object / datetime / bool) only.
    dt = [(c, str(want[c].dtype), str(got[c].dtype)) for c in want.columns
          if want[c].dtype.kind != got[c].dtype.kind
          and not (want[c].dtype.kind in 'iu' and got[c].dtype.kind in 'iu')]
    if dt:
        return ('bad', "dtype " + "; ".join(
            f"{c}: want={a} got={b}" for c, a, b in dt[:4]))
    ws = want.sort_values(by=list(want.columns), ignore_index=True)
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    if len(ws) != len(gs):
        return ('bad', f"rows want={len(ws)} got={len(gs)}")
    diffs = []
    for c in ws.columns:
        a, b = ws[c], gs[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                if float_rtol:
                    # x10 scale-point mode only: summation order over
                    # 10x the rows moves the 16th digit of a float
                    # SUM (pure association noise, not a value
                    # difference); the driver's sf0.01 gate stays
                    # bit-exact (default rtol 0).
                    close = (a - b).abs() <= float_rtol * b.abs().clip(lower=1.0)
                    neq = ~(close | (a.isna() & b.isna()))
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = ~((a.astype(str) == b.astype(str)))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"{c}[{i}]: want={a[i]!r} got={b[i]!r} (n={int(neq.sum())})")
        except Exception as e:
            diffs.append(f"{c}: cmp error {e}")
    if diffs:
        return ('bad', "; ".join(diffs[:3]))
    return 'ok'

for name, sql in sorted(oracle.items()):
    if name in skipped:
        continue
    since_recycle += 1
    if since_recycle > RECYCLE_EVERY:
        con = recycle(con)
        since_recycle = 1
    print(f"[crosscheck] {name}", file=sys.stderr, flush=True)
    res = None
    for attempt in (1, 2):
        try:
            res = check_one(name, sql)
            break
        except duckdb.OutOfMemoryException as e:
            if attempt == 1:
                # one clean-slate retry: the oracle itself may be fine
                # on a fresh buffer pool (the r19 recycle-OOM class)
                print(f"[crosscheck] {name} OOM, recycling and retrying",
                      file=sys.stderr, flush=True)
                con = recycle(con)
                since_recycle = 1
            else:
                res = ('bad', f"EXC {str(e)[:200]}")
        except Exception as e:
            res = ('bad', f"EXC {str(e)[:200]}")
            break
    if res == 'timeout':
        timed_out.append(name)
    elif res == 'ok':
        ok.append(name)
    elif isinstance(res, tuple):
        bad.append((name, res[1]))

print(f"OK ({len(ok)}): {' '.join(ok)}")
if timed_out:
    print(f"ORACLE-TIMEOUT ({len(timed_out)}): {' '.join(timed_out)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
# Optional JSON artifact (CROSSCHECK_OUT=path): the x10 scale-point
# correctness run commits its result next to SCALE_SWEEP.json.
out_path = os.environ.get("CROSSCHECK_OUT")
if out_path:
    json.dump({
        "metric": "oracle_crosscheck", "sfdir": sfdir,
        "n_oracles": len(oracle), "ok": len(ok), "fail": len(bad),
        "oracle_timeout": sorted(timed_out),
        "oracle_skipped": skipped,
        "timeout_s": timeout_s, "float_rtol": float_rtol,
        "failures": {n: w[:300] for n, w in bad},
        "ok_names": sorted(ok),
    }, open(out_path, "w"), indent=1)
# A timed-out oracle is NOT a pass: exit nonzero so callers gating on
# status can't see green over unverified oracles. CROSSCHECK_TIMEOUT_OK=1
# opts back in to the old behavior for exploratory runs.
timeouts_fail = timed_out and os.environ.get("CROSSCHECK_TIMEOUT_OK") != "1"
sys.exit(1 if (bad or timeouts_fail) else 0)
