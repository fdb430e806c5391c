#!/usr/bin/env python3
"""Generate an N-fold scaled slice of ALL testdata tables — the sf1.0
build for the committed sf1 bench window (BENCH_NOTES round 10): 10x
sf0.1 ~= sf1.0 (6M lineitem).

Usage: python3 tools/make_sf.py [srcDir] [outDir] [copies]

Same disjointness doctrine as tools/scale10x.py (which scales only the
5-query subset): every id key shifts by copy*10^7 so copies never
collide in joins/windows/graphs and the expected cost model is linear
in N; document text letter-rotates per copy so cross-copy shingle
similarity is ~zero (no O(N^2) result-set explosion in the near-dup
queries); embeddings rotate their components per copy so cross-copy
cosine twins don't pile into every top-k. Dimension tables (nation,
region) pass through — they are dimension-bounded at every SF.

Driver-side tooling only (duckdb, like tools/check.py) — not part of
the Spark library.
"""
import os
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
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    os.makedirs(out, exist_ok=True)

    def write(table, select_for_copy):
        union = " UNION ALL ".join(
            f"SELECT {select_for_copy(c)}"
            f" FROM read_parquet('{src}/{table}.parquet')"
            for c in range(n))
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

    def doc_text(c):
        if c == 0:
            return "text"
        frm = LOWER + UPPER + DIGIT
        to = rot(LOWER, c % 26) + rot(UPPER, c % 26) + rot(DIGIT, c % 10)
        return f"translate(text, '{frm}', '{to}')"

    write("documents", lambda c:
          f"doc_id + {c * OFF} AS doc_id, {doc_text(c)} AS text,"
          f" lang, source, n_chars")

    write("lineitem", lambda c:
          f"l_orderkey + {c * OFF} AS l_orderkey,"
          f" l_partkey + {c * OFF} AS l_partkey,"
          f" l_suppkey + {c * OFF} AS l_suppkey,"
          f" l_linenumber, l_quantity, l_extendedprice, l_discount,"
          f" l_tax, l_returnflag, l_linestatus, l_shipdate")

    write("orders", lambda c:
          f"o_orderkey + {c * OFF} AS o_orderkey,"
          f" o_custkey + {c * OFF} AS o_custkey,"
          f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")

    write("customer", lambda c:
          f"c_custkey + {c * OFF} AS c_custkey, c_name, c_nationkey,"
          f" c_acctbal, c_mktsegment")

    write("part", lambda c:
          f"p_partkey + {c * OFF} AS p_partkey, p_name, p_brand, p_type,"
          f" p_size, p_retailprice")

    write("supplier", lambda c:
          f"s_suppkey + {c * OFF} AS s_suppkey, s_name, s_nationkey,"
          f" s_acctbal")

    write("events", lambda c:
          f"event_id + {c * OFF} AS event_id, ts,"
          f" user_id + {c * OFF} AS user_id, event_type, value, props")

    # component rotation keeps the norm, moves the direction — copies
    # stop being exact cosine twins of each other
    def emb(c):
        if c == 0:
            return "embedding"
        r = c % 63 + 1
        return (f"(embedding[{r + 1}:len(embedding)]"
                f" || embedding[1:{r}])::FLOAT[] AS embedding")

    write("embeddings", lambda c:
          f"vec_id + {c * OFF} AS vec_id, {emb(c)}, label")

    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t in ("documents", "lineitem", "orders", "customer", "part",
              "supplier", "events", "embeddings", "nation", "region"):
        r = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')")
        print(t, r.fetchone()[0])


if __name__ == "__main__":
    main()
