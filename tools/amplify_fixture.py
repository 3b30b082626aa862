#!/usr/bin/env python3
"""Amplify a fixture directory mult-fold for scale testing of the fuzz
harness (VERDICT r14 task 4: prove the data-derived `_coarsen` offsets
at an amplified SF).

Each table becomes `mult` copies with every KEY-DOMAIN column offset by
copy_index * 1e10, so

  - single-column PKs stay UNIQUE at any mult (the window/LIMIT fuzz
    templates rely on that),
  - FK chains stay consistent (both sides of every JOINS edge offset by
    the same stride, so copy i joins copy i — amplification multiplies
    rows, never fans joins quadratically),
  - BIGINT headroom holds (base keys < 1e10; mult * 1e10 << 2^63).

String/money/timestamp columns are copied verbatim (duplicated content
is fine for the grammar; DuckDB preserves the timestamp unit, and the
Spark side reads events through the same Ctx normalization as always).

Usage: python3 tools/amplify_fixture.py <sfDir> <outDir> <mult>
"""
import os
import sys

import duckdb

STRIDE = 10_000_000_000

# key-domain columns per table: both sides of every fuzz_gen.JOINS
# edge, plus each table's own PK
DOMAINS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
    "documents": ["doc_id"],
    "embeddings": ["doc_id"],
    "events": ["event_id"],
}


def main():
    sf_dir, out_dir, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, keys in DOMAINS.items():
        src = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(src):
            continue
        cols = [r[0] for r in
                con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {STRIDE} AS {c}" if c in keys else c
            for c in cols)
        con.sql(f"COPY (SELECT {sel} FROM '{src}' "
                f"CROSS JOIN range({mult}) r(i)) "
                f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
