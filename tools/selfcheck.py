#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the Verify output directory (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same fixture parquet tables,
and compares: columns sorted by name, rows sorted, values exact (with a
report of near-miss magnitudes when floats differ).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def rows_of(rel_df):
    cols = sorted(rel_df.columns)
    df = rel_df[cols]
    recs = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(recs, key=lambda r: tuple(str(x) for x in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # null-injected fixture derivatives (fuzz --nulls mode): same
    # physical files the Spark side registered
    nullfix = os.path.join(out_dir, "nullfix")
    if os.path.isdir(nullfix):
        for f in os.listdir(nullfix):
            if f.endswith(".parquet"):
                con.sql(f"CREATE VIEW {f[:-8]} AS SELECT * FROM "
                        f"'{nullfix}/{f}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want_rel = con.sql(sql).df()
            gc, got = rows_of(got_rel)
            wc, want = rows_of(want_rel)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={wc}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: row count spark={len(got)} duckdb={len(want)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                # float near-miss diagnostics
                diffs = []
                for c, gv, wv in zip(gc, g, w):
                    if gv != wv and not (
                        isinstance(gv, float) and isinstance(wv, float)
                        and math.isnan(gv) and math.isnan(wv)
                    ):
                        if isinstance(gv, float) and isinstance(wv, float):
                            diffs.append(f"{c}: {gv!r} vs {wv!r} (d={gv-wv:.3e})")
                        else:
                            diffs.append(f"{c}: {gv!r} vs {wv!r}")
                if diffs:
                    bad = (i, diffs)
                    break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: " + "; ".join(bad[1][:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
