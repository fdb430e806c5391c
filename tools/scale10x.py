#!/usr/bin/env python3
"""Generate an N-fold (default 10x) scaled slice of the sf0.1 testdata for
the scaling-curve measurement (BENCH_NOTES "measured scale story").

Usage: python3 tools/scale10x.py [srcDir] [outDir] [copies]

Only the tables the five heaviest queries read are scaled: documents
(d09, t06), lineitem + orders (g02, r07, r04). Each copy shifts every id
key by copy*10^7 so the copies are DISJOINT — the trade graph becomes N
independent components and window/groupBy keys never collide across
copies, so the expected cost model is linear in N (which is exactly the
claim under test). Document text is letter-rotated per copy (a Caesar
translate keeping length, casing structure and shingle counts) so
cross-copy shingle similarity is ~zero: without it, every doc would have
N-1 exact twins and d09's *output* (pairs with Jaccard >= 0.6) would grow
O(N^2), measuring result-set explosion instead of engine scaling.

Driver-side tooling only (duckdb, like tools/check.py) — not part of the
Spark library.
"""
import sys
import duckdb

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"
OFF = 10_000_000


def rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)

    docs = []
    for c in range(n):
        if c == 0:
            t = "text"
        else:
            frm = LOWER + UPPER + DIGIT
            to = rot(LOWER, c % 26) + rot(UPPER, c % 26) + rot(DIGIT, c % 10)
            t = f"translate(text, '{frm}', '{to}')"
        docs.append(
            f"SELECT doc_id + {c * OFF} AS doc_id, {t} AS text,"
            f" lang, source, n_chars"
            f" FROM read_parquet('{src}/documents.parquet')")
    con.execute(
        f"COPY ({' UNION ALL '.join(docs)}) TO '{out}/documents.parquet'"
        f" (FORMAT PARQUET)")

    li = " UNION ALL ".join(
        f"SELECT l_orderkey + {c * OFF} AS l_orderkey,"
        f" l_partkey + {c * OFF} AS l_partkey,"
        f" l_suppkey + {c * OFF} AS l_suppkey,"
        f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        f" l_returnflag, l_linestatus, l_shipdate"
        f" FROM read_parquet('{src}/lineitem.parquet')" for c in range(n))
    con.execute(f"COPY ({li}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")

    orders = " UNION ALL ".join(
        f"SELECT o_orderkey + {c * OFF} AS o_orderkey,"
        f" o_custkey + {c * OFF} AS o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM read_parquet('{src}/orders.parquet')" for c in range(n))
    con.execute(f"COPY ({orders}) TO '{out}/orders.parquet' (FORMAT PARQUET)")

    # customer (g08's point table): key shift relocates each copy's
    # derived deci-degree coordinates (1e7 % 3600 != 0) so copies spread
    # over the grid instead of stacking on identical points
    cust = " UNION ALL ".join(
        f"SELECT c_custkey + {c * OFF} AS c_custkey, c_nationkey,"
        f" c_acctbal, c_mktsegment"
        f" FROM read_parquet('{src}/customer.parquet')" for c in range(n))
    con.execute(f"COPY ({cust}) TO '{out}/customer.parquet' (FORMAT PARQUET)")

    # dimension tables pass through unscaled (g08 needs nation)
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t in ("documents", "lineitem", "orders", "customer"):
        r = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')")
        print(t, r.fetchone()[0])


if __name__ == "__main__":
    main()
