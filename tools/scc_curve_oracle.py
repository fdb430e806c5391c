#!/usr/bin/env python3
"""DuckDB side of the r36 scaling curve: the committed r36 oracle's
block-local mutual-reachability closure, over the edge parquet
graft.tools.SccCurve writes (same structure, same SQL shape — reach is
block-local by construction, <=8 rows per node, so the closure is
linear in V at every scale).

Usage: python3 tools/scc_curve_oracle.py <outDir> [passes]
Driver-side tooling only (duckdb, like tools/check.py).
"""
import json
import sys
import time

import duckdb


def main():
    out = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    con = duckdb.connect()
    sql = f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT src, dst FROM read_parquet('{out}/edges.parquet/*.parquet')),
    n2 AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
    reach(a, d) AS (
      SELECT v, v FROM n2
      UNION
      SELECT reach.a, e.dst FROM reach JOIN e ON e.src = reach.d),
    lab AS (
      SELECT r1.a AS node, MIN(r1.d) AS scc
      FROM reach r1 JOIN reach r2 ON r1.a = r2.d AND r1.d = r2.a
      GROUP BY r1.a)
    SELECT scc, count(*) AS n_members FROM lab
    GROUP BY scc ORDER BY scc
    """
    con.execute(sql).fetchall()  # warmup
    secs = []
    n_scc = 0
    for _ in range(passes):
        t0 = time.time()
        rows = con.execute(sql).fetchall()
        secs.append(time.time() - t0)
        n_scc = len(rows)
    print(json.dumps({"tool": "scc_curve_oracle", "n_scc": n_scc,
                      "passes": [round(s, 3) for s in secs],
                      "duck_sec": round(min(secs), 3)}))


if __name__ == "__main__":
    main()
