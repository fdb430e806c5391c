#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and hash-compares values. Reports
both row-order-sensitive and order-insensitive equality so ORDER BY bugs
are visible.
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if not av.equals(bv):
                # equals is dtype-sensitive; retry after normalizing
                if not (av.astype(object).where(pd.notna(av), None).tolist()
                        == bv.astype(object).where(pd.notna(bv), None).tolist()):
                    return False
        except Exception:
            return False
    return True

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = 0
    duck_times = {}
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, '*.parquet'))
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)])
                    if files else pd.DataFrame())
        if name not in oracle:
            status = 'ROWS_ONLY ok' if len(got) > 0 else 'ROWS_ONLY EMPTY'
            print(f"{name:38s} {status}  rows={len(got)}")
            if len(got) > 0: n_ok += 1
            continue
        try:
            t0 = time.monotonic()
            want = canon(con.sql(oracle[name]).df())
            duck_times[name] = round(time.monotonic() - t0, 4)
        except Exception as e:
            print(f"{name:38s} ORACLE_SQL_ERROR: {e}")
            continue
        ordered = values_equal(got, want)
        if ordered:
            print(f"{name:38s} OK  rows={len(got)}")
            n_ok += 1
            continue
        # diagnose
        gs = got.sort_values(list(got.columns), kind='mergesort').reset_index(drop=True) if len(got) else got
        ws = want.sort_values(list(want.columns), kind='mergesort').reset_index(drop=True) if len(want) else want
        unordered = values_equal(gs, ws)
        print(f"{name:38s} MISMATCH ordered={ordered} unordered={unordered} "
              f"shape got={got.shape} want={want.shape}")
        if list(got.columns) != list(want.columns):
            print(f"  cols got : {list(got.columns)}\n  cols want: {list(want.columns)}")
        else:
            for c in got.columns:
                if len(got) == len(want) and not got[c].equals(want[c]):
                    diff = (got[c] != want[c])
                    idx = diff[diff].index[:3]
                    print(f"  col {c} dtypes {got[c].dtype}/{want[c].dtype} first diffs:")
                    for i in idx:
                        print(f"    row {i}: got={got[c][i]!r} want={want[c][i]!r}")
    # Per-query DuckDB timings (single run, same process): written next to
    # the verify output so bench reviews can compare each Spark query
    # against its oracle's cost instead of arguing about totals.
    times_path = os.path.join(out_dir, 'duckdb_times.json')
    with open(times_path, 'w') as f:
        json.dump({'total_sec': round(sum(duck_times.values()), 4),
                   'queries': duck_times}, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(names)} ok   (oracle timings -> {times_path}, "
          f"duckdb total {sum(duck_times.values()):.2f}s)")

if __name__ == '__main__':
    main()
