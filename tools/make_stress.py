#!/usr/bin/env python3
"""Build a duplicate-heavy stress corpus from sf0.1 (driver-side tooling).

Replicates documents/embeddings 8x and lineitem/orders/events 4x with
key offsets — every text gains 8 exact copies, which is the adversarial
case for pair-based dedup (k copies => k^2 join fan-out). Usage:

    python3 tools/make_stress.py [outdir=/tmp/sfbig]
    SPARK_GRAFT_SF_DIR=/tmp/sfbig ... graft.Bench
"""
import shutil
import sys

import duckdb

SF = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def rep(table, key_cols, copies):
        cols = con.execute(f"SELECT * FROM '{SF}/{table}.parquet' LIMIT 0").fetchdf().columns
        parts = []
        for i in range(copies):
            sel = ", ".join(
                (f"{c} + {i}*10000000 AS {c}" if c in key_cols else c) for c in cols)
            parts.append(f"SELECT {sel} FROM '{SF}/{table}.parquet'")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

    rep("documents", ["doc_id"], 8)
    rep("embeddings", ["vec_id"], 8)
    rep("lineitem", ["l_orderkey"], 4)
    rep("orders", ["o_orderkey"], 4)
    rep("events", ["event_id"], 4)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"stress corpus at {out}")


if __name__ == "__main__":
    main()
