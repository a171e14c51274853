"""Build the id-offset N-x scale corpus used by BASELINE.md's scale-up
tables: N copies of every base table with all entity-key columns
shifted by copy*OFFSET so joins stay consistent and every copy is a
disjoint key universe. Text/embedding payloads repeat verbatim — the
ADVERSARIAL case for dedup/df operators (every shingle/vector's
frequency multiplies by N, stressing bucket caps and df pruning).

Usage: python tools/build_scale_corpus.py [N] [base_dir] [out_dir]
Defaults: 5 /root/testdata/sf0.1 /tmp/sf0.1x5
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 10_000_000

# per-table entity-key columns to shift (FKs shift with their PKs)
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/{os.path.basename(base)}x{n}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYS.items():
        parts = []
        cols = con.sql(f"SELECT * FROM '{base}/{t}.parquet' LIMIT 0").columns
        for i in range(n):
            proj = ", ".join(
                f"{c} + {i * OFFSET} AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {proj} FROM '{base}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {rows} rows -> {out}/{t}.parquet", flush=True)


if __name__ == "__main__":
    main()
