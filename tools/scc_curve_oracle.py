#!/usr/bin/env python3
"""DuckDB side of the r36 scaling curve: the committed r36 oracle SQL
(hash build + block wiring + block-local mutual-reachability closure),
over the synthetic one-column orders.parquet graft.tools.SccCurve
writes — so both engines pay the same construction work at every scale
and the curve points are comparable with the committed sf0.1/sf1 rows.

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
    WITH RECURSIVE orders AS (
      SELECT o_orderkey FROM read_parquet('{out}/orders.parquet/*.parquet')),
    nv AS (
      SELECT 8 * GREATEST(COUNT(*) // 400, 8) AS nn FROM orders),
    h0 AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5('1:' || (CAST(o_orderkey AS VARCHAR))), 1, 8))::BIGINT
                  % nv.nn AS BIGINT) AS n
      FROM orders, nv),
    ring AS (
      SELECT DISTINCT n AS src,
        CASE WHEN n % 8 IN (2, 5) THEN n - 2
             WHEN n % 8 = 7 THEN n - (n % 8) + 3
             ELSE n + 1 END AS dst
      FROM h0),
    br AS (
      SELECT DISTINCT n AS src, n - (n % 8) + 3 AS dst
      FROM h0 WHERE o_orderkey % 3 = 0 AND n % 8 = 1),
    e AS (SELECT src, dst FROM ring UNION SELECT src, dst FROM br),
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
