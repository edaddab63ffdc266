"""Synthesize an sf1 dataset (10× sf0.1) for the self-run scale
experiment (BENCH_SF1.md) — NOT part of the driver gate, which pins
its own testdata.

Replicates every scaled table 10× with FK-consistent key offsets
(dimension tables region/nation stay fixed, like TPC-H), so the data
distribution per key is identical to sf0.1 and any headline-query
regression at sf1 is attributable to scale, not skew drift.

Usage: python tools/make_sf1.py [outdir=/tmp/sf1.0]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
REPLICAS = 10

# per-table key-offset recipe: column -> offset unit (replica i adds
# i * unit; units exceed the sf0.1 max of every referenced key space)
OFFSETS: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000, "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, offs in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{OUT}/{table}.parquet"
        if not offs:  # fixed dimension table
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        branches = []
        for i in range(REPLICAS):
            sel = ", ".join(
                f"({c} + {i * offs[c]})::BIGINT AS {c}" if c in offs else c
                for c in cols
            )
            branches.append(f"SELECT {sel} FROM '{src}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(branches)}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
