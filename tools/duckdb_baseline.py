#!/usr/bin/env python3
"""Publish a falsifiable performance baseline (VERDICT r12 #1).

BASELINE.json carries no reference timings (the reference's ClickHouse
deployment is unobtainable in this environment), so the "within 2x of
baseline" gate needs a measurable stand-in: DuckDB's own wall-times on
the ORACLE SQL — the exact same queries, same parquet tables, same
host, a state-of-the-art single-node OLAP engine. This tool times each
oracle_sql.json query in DuckDB (min of N passes after a warm-up scan)
and writes BASELINE_DUCKDB.json; Bench.scala reads it and emits a
vs_baseline ratio (our steady seconds / DuckDB seconds) per headline
query into the bench JSON.

Usage: duckdb_baseline.py <sfdir> <oracle_sql.json> <out.json> [passes]
"""
import sys, os, json, glob, time, threading
import duckdb

sfdir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
timeout_s = float(os.environ.get("DUCKDB_BASELINE_TIMEOUT", "300"))

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(oracle_path))
times, failed = {}, {}
for i, (name, sql) in enumerate(sorted(oracle.items())):
    samples = []
    err = None
    for p in range(passes):
        # watchdog: a pathological plan (the oracle side of a gate query
        # can be quadratic by design) interrupts instead of hanging the
        # whole baseline run
        done = threading.Event()
        def watchdog():
            if not done.wait(timeout_s):
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            samples.append(time.monotonic() - t0)
        except Exception as e:
            err = f"{type(e).__name__}: {e}"[:200]
            break
        finally:
            done.set()
    if err:
        failed[name] = err
    elif samples:
        times[name] = round(min(samples), 4)
    print(f"[baseline {i+1}/{len(oracle)}] {name} "
          f"{times.get(name, 'FAIL')}", file=sys.stderr, flush=True)

out = {
    "engine": "duckdb",
    "engine_version": duckdb.__version__,
    "threads": os.cpu_count(),
    "sf": sfdir,
    "passes": passes,
    "aggregation": "min",
    "note": ("DuckDB wall-times on the oracle SQL over the same parquet "
             "tables on the same host - the comparison baseline for "
             "Bench's vs_baseline ratios (BASELINE.json publishes no "
             "reference timings). Queries without oracle SQL have no "
             "entry; failed/interrupted oracles are listed under "
             "'failed'."),
    "times": times,
    "failed": failed,
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"[baseline] wrote {out_path}: {len(times)} timed, "
      f"{len(failed)} failed", file=sys.stderr)
