#!/usr/bin/env python3
"""Build a duplicate-heavy stress corpus from sf0.1 (driver-side tooling).

Replicates documents/embeddings 8x and lineitem/orders/events 4x with
key offsets — every text gains 8 exact copies, which is the adversarial
case for pair-based dedup (k copies => k^2 join fan-out). Usage:

    python3 tools/make_stress.py [outdir=/tmp/sfbig]
    SPARK_GRAFT_SF_DIR=/tmp/sfbig ... graft.Bench

With --hot, additionally injects adversaries engineered to CROSS the
engine's hot-key caps (the x8 corpus alone tops out at shingle df=200,
well under DefaultHotKeyCap=1000, so drop metrics never fire on it):

  - a fixed 12-token boilerplate sentence appended to every even
    doc_id  -> its shingles reach df ~ half the corpus (>> 1000),
    forcing the q40/q142/q95/q171 df-cap drops;
  - supplier replicated x2 plus one synthetic mega-order giving ONE
    customer a lineitem at every supplier -> that customer's distinct-
    supplier count (2000) crosses the q131/q132 per-customer cap;
  - 3000 exact copies of one embedding vector -> a single LSH bucket
    over the q78/q124/q167 bucket cap.

    python3 tools/make_stress.py /tmp/sfhot --hot
"""
import shutil
import sys

import duckdb

SF = "/root/testdata/sf0.1"

BOILERPLATE = ("subscribe to our newsletter for updates terms of service "
               "apply all rights reserved contact us")


def main():
    args = [a for a in sys.argv[1:] if a != "--hot"]
    hot = "--hot" in sys.argv[1:]
    out = args[0] if args else ("/tmp/sfhot" if hot else "/tmp/sfbig")
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def rep(table, key_cols, copies, extra_sql=None, text_mutate=None):
        cols = con.execute(f"SELECT * FROM '{SF}/{table}.parquet' LIMIT 0").fetchdf().columns
        parts = []
        for i in range(copies):
            sel = ", ".join(
                (f"{c} + {i}*10000000 AS {c}" if c in key_cols
                 else (text_mutate.format(c=c) if text_mutate and c == "text" else c))
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{SF}/{table}.parquet'")
        if extra_sql:
            parts.append(extra_sql)
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

    doc_mut = (f"CASE WHEN doc_id % 2 = 0 THEN {{c}} || ' {BOILERPLATE}' "
               f"ELSE {{c}} END AS {{c}}") if hot else None
    emb_extra = ("SELECT 80000000 + r AS vec_id, e.embedding, e.label "
                 "FROM (SELECT embedding, label FROM "
                 f"'{SF}/embeddings.parquet' WHERE vec_id = 0) e, "
                 "unnest(range(3000)) AS u(r)") if hot else None
    # one synthetic order per supplier-block: customer = min custkey
    # buys one item from EVERY supplier (2x-replicated below)
    li_extra = (
        "SELECT CAST(90000000 AS BIGINT) AS l_orderkey, "
        "CAST(1 AS BIGINT) AS l_partkey, s.s_suppkey AS l_suppkey, "
        "CAST(1 AS INTEGER) AS l_linenumber, "
        "CAST(1 AS DOUBLE) AS l_quantity, CAST(1 AS DOUBLE) AS l_extendedprice, "
        "CAST(0 AS DOUBLE) AS l_discount, CAST(0 AS DOUBLE) AS l_tax, "
        "'N' AS l_returnflag, 'O' AS l_linestatus, "
        "TIMESTAMP '2024-01-01 00:00:00' AS l_shipdate "
        f"FROM '{out}/supplier.parquet' s") if hot else None
    ord_extra = (
        "SELECT CAST(90000000 AS BIGINT) AS o_orderkey, "
        f"(SELECT min(c_custkey) FROM '{SF}/customer.parquet') AS o_custkey, "
        "'O' AS o_orderstatus, CAST(1 AS DOUBLE) AS o_totalprice, "
        "TIMESTAMP '2024-01-01 00:00:00' AS o_orderdate, "
        "'1-URGENT' AS o_orderpriority") if hot else None

    for t in ["region", "nation", "customer", "part"]:
        shutil.copy(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")
    if hot:
        rep("supplier", ["s_suppkey"], 2)
    else:
        shutil.copy(f"{SF}/supplier.parquet", f"{out}/supplier.parquet")

    rep("documents", ["doc_id"], 8, text_mutate=doc_mut)
    rep("embeddings", ["vec_id"], 8, extra_sql=emb_extra)
    rep("lineitem", ["l_orderkey"], 4, extra_sql=li_extra)
    rep("orders", ["o_orderkey"], 4, extra_sql=ord_extra)
    rep("events", ["event_id"], 4)
    print(f"stress corpus at {out}" + (" (hot-key adversaries injected)" if hot else ""))


if __name__ == "__main__":
    main()
