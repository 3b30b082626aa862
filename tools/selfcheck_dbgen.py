#!/usr/bin/env python3
"""DuckDB oracle compare for the ORIGINAL full-column TPC-H surface
(graft.queries.TpchFull) over dbgen .tbl files.

DuckDB reads the same pipe-delimited files with explicit column types —
dates as VARCHAR to match the reference's (and TpchFull's) lexicographic
string-date semantics.

Usage: python3 tools/selfcheck_dbgen.py <tblDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb

# (name, duckdb type); dates intentionally VARCHAR
SCHEMAS = {
    "part": [("p_partkey", "BIGINT"), ("p_name", "VARCHAR"),
             ("p_mfgr", "VARCHAR"), ("p_brand", "VARCHAR"),
             ("p_type", "VARCHAR"), ("p_size", "INTEGER"),
             ("p_container", "VARCHAR"), ("p_retailprice", "DOUBLE"),
             ("p_comment", "VARCHAR")],
    "supplier": [("s_suppkey", "BIGINT"), ("s_name", "VARCHAR"),
                 ("s_address", "VARCHAR"), ("s_nationkey", "INTEGER"),
                 ("s_phone", "VARCHAR"), ("s_acctbal", "DOUBLE"),
                 ("s_comment", "VARCHAR")],
    "partsupp": [("ps_partkey", "BIGINT"), ("ps_suppkey", "BIGINT"),
                 ("ps_availqty", "INTEGER"), ("ps_supplycost", "DOUBLE"),
                 ("ps_comment", "VARCHAR")],
    "customer": [("c_custkey", "BIGINT"), ("c_name", "VARCHAR"),
                 ("c_address", "VARCHAR"), ("c_nationkey", "INTEGER"),
                 ("c_phone", "VARCHAR"), ("c_acctbal", "DOUBLE"),
                 ("c_mktsegment", "VARCHAR"), ("c_comment", "VARCHAR")],
    "orders": [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
               ("o_orderstatus", "VARCHAR"), ("o_totalprice", "DOUBLE"),
               ("o_orderdate", "VARCHAR"), ("o_orderpriority", "VARCHAR"),
               ("o_clerk", "VARCHAR"), ("o_shippriority", "INTEGER"),
               ("o_comment", "VARCHAR")],
    "lineitem": [("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
                 ("l_suppkey", "BIGINT"), ("l_linenumber", "INTEGER"),
                 ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
                 ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
                 ("l_returnflag", "VARCHAR"), ("l_linestatus", "VARCHAR"),
                 ("l_shipdate", "VARCHAR"), ("l_commitdate", "VARCHAR"),
                 ("l_receiptdate", "VARCHAR"), ("l_shipinstruct", "VARCHAR"),
                 ("l_shipmode", "VARCHAR"), ("l_comment", "VARCHAR")],
    "nation": [("n_nationkey", "INTEGER"), ("n_name", "VARCHAR"),
               ("n_regionkey", "INTEGER"), ("n_comment", "VARCHAR")],
    "region": [("r_regionkey", "INTEGER"), ("r_name", "VARCHAR"),
               ("r_comment", "VARCHAR")],
}


def norm(v):
    # NaN != NaN would fail both-NULL aggregate rows
    if isinstance(v, float) and v != v:
        return None
    return v


def rows_of(df):
    cols = sorted(df.columns)
    df = df[cols]
    recs = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(recs, key=lambda r: tuple(str(x) for x in r))


def main():
    tbl_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t, schema in SCHEMAS.items():
        cols = {n: ty for n, ty in schema}
        cols["trailing_empty"] = "VARCHAR"
        collist = ", ".join(n for n, _ in schema)
        coldict = ", ".join(f"'{n}': '{ty}'" for n, ty in cols.items())
        con.sql(
            f"CREATE VIEW {t} AS SELECT {collist} FROM read_csv("
            f"'{tbl_dir}/{t}.tbl', delim='|', header=false, "
            f"columns={{{coldict}}})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            gc, g = rows_of(got)
            wc, w = rows_of(want)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duckdb={wc}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(w)}")
            n_fail += 1
        elif g != w:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"FAIL {name}: first diff row {bad}: {g[bad]} vs {w[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
