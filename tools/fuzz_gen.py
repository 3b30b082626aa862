#!/usr/bin/env python3
"""Seeded generator for the differential SQL fuzz harness.

Emits N random queries from an ANSI-safe grammar (exact-typed only:
BIGINT arithmetic, the floor(x*100+0.5) money grid from CLAUDE.md,
min/max on any type, sampled-literal predicates, FK-path join chains,
LIMIT always under a total key order) that are valid and
value-identical by construction in BOTH Spark SQL and DuckDB. The
point is breadth the hand-written oracle entries can't give: no human
picked these plans, so agreement is evidence about the whole
session/read/execute path, not about one curated query.

Writes <outDir>/queries.tsv (name<TAB>sql, consumed by
`runMain graft.SqlBatch <sfDir> <outDir>`) and <outDir>/oracle_sql.json
(consumed by `tools/selfcheck.py <sfDir> <outDir>`).

Usage: python3 tools/fuzz_gen.py <sfDir> <outDir> [seed] [nQueries]

End-to-end:
  python3 tools/fuzz_gen.py /root/testdata/sf0.01 /tmp/fuzz 1 120
  sbt -batch "runMain graft.SqlBatch /root/testdata/sf0.01 /tmp/fuzz"
  python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/fuzz
"""
import json
import os
import random
import sys

import duckdb

# per-table column model: only columns whose cross-engine behavior is
# exact under the grammar below. doubles appear ONLY via comparisons
# and min/max (bit-identical reads) or through the money grid.
TABLES = {
    "lineitem": {
        "key": ["l_orderkey", "l_linenumber"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "money": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "lowstr": ["l_returnflag", "l_linestatus"],
        "str": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
    },
    "orders": {
        "key": ["o_orderkey"],
        "int": ["o_orderkey", "o_custkey"],
        "money": ["o_totalprice"],
        "lowstr": ["o_orderstatus", "o_orderpriority"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
    },
    "customer": {
        "key": ["c_custkey"],
        "int": ["c_custkey", "c_nationkey"],
        "money": ["c_acctbal"],
        "lowstr": ["c_mktsegment"],
        "str": ["c_mktsegment", "c_name"],
        "ts": [],
    },
    "supplier": {
        "key": ["s_suppkey"],
        "int": ["s_suppkey", "s_nationkey"],
        "money": ["s_acctbal"],
        "lowstr": [],
        "str": ["s_name"],
        "ts": [],
    },
    "part": {
        "key": ["p_partkey"],
        "int": ["p_partkey", "p_size"],
        "money": ["p_retailprice"],
        "lowstr": ["p_brand"],
        "str": ["p_brand", "p_type", "p_name"],
        "ts": [],
    },
    "nation": {
        "key": ["n_nationkey"],
        "int": ["n_nationkey", "n_regionkey"],
        "money": [],
        "lowstr": ["n_name"],
        "str": ["n_name"],
        "ts": [],
    },
    "region": {
        "key": ["r_regionkey"],
        "int": ["r_regionkey"],
        "money": [],
        "lowstr": ["r_name"],
        "str": ["r_name"],
        "ts": [],
    },
    "documents": {
        "key": ["doc_id"],
        "int": ["doc_id", "n_chars"],
        "money": [],
        "lowstr": ["lang", "source"],
        "str": ["lang", "source"],
        "ts": [],
    },
    # read through Ctx.events on the Spark side (ns→µs normalization);
    # `value` is a 2-decimal double, so the money grid applies
    "events": {
        "key": ["event_id"],
        "int": ["event_id", "user_id"],
        "money": ["value"],
        "lowstr": ["event_type"],
        "str": ["event_type", "props"],
        "ts": ["ts"],
    },
}

# FK edges (child, child_col, parent, parent_col); chains follow them
JOINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


class Gen:
    def __init__(self, sf_dir, seed):
        self.rng = random.Random(seed)
        self.con = duckdb.connect()
        self.con.sql("SET threads = 1")  # reproducibility
        for t in TABLES:
            self.con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        self.samples = {}  # (table, col) -> sampled distinct values

    def sample_vals(self, table, col, n=40):
        """Deterministic pseudo-random distinct sample: md5 ordering is
        a fixed total order, so the same fixture always yields the same
        literal pool regardless of thread count or scan order (a
        reservoir sample with a seed is only deterministic
        single-threaded, and DISTINCT+LIMIT without ORDER BY isn't at
        all). String values carrying backslashes or control characters
        are excluded: Spark SQL processes C-style escapes inside string
        literals while DuckDB takes backslashes literally, so such
        literals would diverge by harness construction, not by engine
        behavior."""
        key = (table, col)
        if key not in self.samples:
            rows = self.con.sql(
                f"SELECT v FROM (SELECT DISTINCT {col} AS v FROM {table} "
                f"WHERE {col} IS NOT NULL) t "
                f"ORDER BY md5(CAST(v AS VARCHAR)) LIMIT {n}").fetchall()
            vals = [r[0] for r in rows]
            self.samples[key] = [
                v for v in vals
                if not (isinstance(v, str) and
                        ("\\" in v or any(ord(ch) < 32 for ch in v)))]
        return self.samples[key]

    def lit(self, table, col, kind):
        vals = self.sample_vals(table, col)
        if not vals:
            return None
        v = self.rng.choice(vals)
        if kind == "str":
            return "'" + str(v).replace("'", "''") + "'"
        if kind == "ts":
            return f"TIMESTAMP '{v}'"
        if kind == "money":
            # exact decimal text round-trips identically in both engines
            return repr(float(v))
        return str(int(v))

    # ---- predicates -------------------------------------------------
    def atom_pred(self, table, q):
        c = TABLES[table]
        choices = []
        if c["int"]:
            choices.append("int")
        if c["money"]:
            choices.append("money")
        if c["str"]:
            choices.append("str")
        if c["ts"]:
            choices.append("ts")
        kind = self.rng.choice(choices)
        col = self.rng.choice(c[kind])
        ref = f"{q}.{col}" if q else col
        # FK columns: sometimes an IN-subquery against the parent
        if kind == "int" and self.rng.random() < 0.15:
            for child, ccol, parent, pcol in JOINS:
                if child == table and ccol == col:
                    sub = self.pred(parent, None, depth=1)
                    return (f"{ref} IN (SELECT {pcol} FROM {parent} "
                            f"WHERE {sub})")
        if kind in ("int", "money", "ts"):
            op = self.rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            lit = self.lit(table, col, kind)
            if lit is None:
                return "1 = 1"
            return f"{ref} {op} {lit}"
        # strings: =, IN-list, LIKE prefix
        form = self.rng.choice(["eq", "in", "like"])
        if form == "eq":
            lit = self.lit(table, col, "str")
            return f"{ref} = {lit}" if lit else "1 = 1"
        if form == "in":
            vals = self.sample_vals(table, col)
            if not vals:
                return "1 = 1"
            pick = self.rng.sample(vals, min(len(vals),
                                             self.rng.randint(2, 4)))
            lits = ", ".join(
                "'" + str(v).replace("'", "''") + "'" for v in pick)
            return f"{ref} IN ({lits})"
        vals = self.sample_vals(table, col)
        if not vals:
            return "1 = 1"
        pref = str(self.rng.choice(vals))[:3]
        pref = "".join(ch for ch in pref if ch not in "%_\\'")
        return f"{ref} LIKE '{pref}%'"

    def pred(self, table, q, depth=2):
        if depth == 0 or self.rng.random() < 0.4:
            return self.atom_pred(table, q)
        op = self.rng.choice(["AND", "OR"])
        a = self.pred(table, q, depth - 1)
        b = self.pred(table, q, depth - 1)
        s = f"({a} {op} {b})"
        if self.rng.random() < 0.15:
            s = f"(NOT {s})"
        return s

    # ---- exact integer expressions ----------------------------------
    def int_expr(self, table, q, depth=1):
        c = TABLES[table]
        ref = lambda col: f"{q}.{col}" if q else col
        forms = ["col", "mod", "mul", "len", "case"]
        if c["money"]:
            forms.append("grid")
        form = self.rng.choice(forms)
        if form == "col" or depth == 0:
            return ref(self.rng.choice(c["int"]))
        if form == "mod":
            return (f"({ref(self.rng.choice(c['int']))} % "
                    f"{self.rng.randint(2, 97)})")
        if form == "mul":
            return (f"({ref(self.rng.choice(c['int']))} * "
                    f"{self.rng.randint(2, 19)})")
        if form == "len":
            if not c["str"]:
                return ref(self.rng.choice(c["int"]))
            return f"length({ref(self.rng.choice(c['str']))})"
        if form == "grid":
            # CLAUDE.md money grid: exact BIGINT carrier for 2-decimal
            # doubles, identical IEEE ops in both engines
            m = self.rng.choice(c["money"])
            return f"CAST(floor({ref(m)} * 100.0 + 0.5) AS BIGINT)"
        # case
        p = self.atom_pred(table, q)
        a = self.int_expr(table, q, 0)
        b = self.int_expr(table, q, 0)
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)"

    def aggs(self, table, q):
        out = [("cnt", "count(*)")]
        n = self.rng.randint(1, 3)
        c = TABLES[table]
        ref = lambda col: f"{q}.{col}" if q else col
        for i in range(n):
            form = self.rng.choice(["sum", "minmax_int", "minmax_str",
                                    "minmax_money", "minmax_ts",
                                    "countd"])
            if form == "sum":
                out.append((f"s{i}",
                            f"CAST(SUM({self.int_expr(table, q)}) "
                            f"AS BIGINT)"))
            elif form == "minmax_int":
                f_ = self.rng.choice(["min", "max"])
                out.append((f"a{i}", f"{f_}({ref(self.rng.choice(c['int']))})"))
            elif form == "minmax_str" and c["str"]:
                f_ = self.rng.choice(["min", "max"])
                out.append((f"t{i}", f"{f_}({ref(self.rng.choice(c['str']))})"))
            elif form == "minmax_money" and c["money"]:
                f_ = self.rng.choice(["min", "max"])
                out.append((f"m{i}",
                            f"{f_}({ref(self.rng.choice(c['money']))})"))
            elif form == "minmax_ts" and c["ts"]:
                f_ = self.rng.choice(["min", "max"])
                out.append((f"d{i}", f"{f_}({ref(self.rng.choice(c['ts']))})"))
            elif form == "countd":
                col = self.rng.choice(c["int"] + c["str"])
                out.append((f"u{i}",
                            f"CAST(COUNT(DISTINCT {ref(col)}) AS BIGINT)"))
        # dedupe aliases produced identical? aliases unique by index
        return out

    # ---- join chains ------------------------------------------------
    def chain(self, max_len=3):
        """A connected chain of distinct tables along FK edges."""
        t0 = self.rng.choice(list(TABLES))
        used = [t0]
        conds = []
        while len(used) < max_len:
            edges = [e for e in JOINS
                     if (e[0] in used) != (e[2] in used)]
            if not edges or self.rng.random() < 0.45:
                break
            e = self.rng.choice(edges)
            new = e[2] if e[0] in used else e[0]
            used.append(new)
            conds.append(f"{e[0]}.{e[1]} = {e[2]}.{e[3]}")
        return used, conds

    def from_clause(self, tables, conds):
        # chain() appends exactly one FK condition per added table, in
        # order — conds[i] connects tables[i+1] to the already-joined set
        out = tables[0]
        for t, on in zip(tables[1:], conds):
            out += f" JOIN {t} ON {on}"
        return out

    # ---- query templates --------------------------------------------
    def group_expr(self, ref):
        """Sometimes wrap a group key in a string scalar function —
        identical text in SELECT and GROUP BY."""
        r = self.rng.random()
        if r < 0.12:
            return f"upper({ref})"
        if r < 0.2:
            return f"substr({ref}, 1, {self.rng.randint(1, 4)})"
        return ref

    def grouped_agg(self):
        tables, conds = self.chain(self.rng.randint(1, 3))
        qualify = len(tables) > 1
        gtabs = [t for t in tables if TABLES[t]["lowstr"]]
        gcols = []
        for t in self.rng.sample(gtabs, min(len(gtabs),
                                            self.rng.randint(1, 2))) \
                if gtabs else []:
            col = self.rng.choice(TABLES[t]["lowstr"])
            gcols.append(self.group_expr(f"{t}.{col}" if qualify else col))
        gcols = list(dict.fromkeys(gcols))
        agg_t = self.rng.choice(tables)
        ag = self.aggs(agg_t, agg_t if qualify else None)
        pred_t = self.rng.choice(tables)
        where = self.pred(pred_t, pred_t if qualify else None)
        sel = [f"{g} AS g{i}" for i, g in enumerate(gcols)] + \
              [f"{e} AS {a}" for a, e in ag]
        sql = f"SELECT {', '.join(sel)} FROM " \
              f"{self.from_clause(tables, conds)} WHERE {where}"
        if gcols:
            sql += f" GROUP BY {', '.join(gcols)}"
            if self.rng.random() < 0.25:
                sql += f" HAVING count(*) >= {self.rng.randint(2, 20)}"
        return sql

    def left_join_agg(self):
        """The q13 shape: parent LEFT JOIN child, count of child keys
        (NULL-skipping) next to count(*)."""
        child, ccol, parent, pcol = self.rng.choice(JOINS)
        g = self.rng.choice(TABLES[parent]["lowstr"]) \
            if TABLES[parent]["lowstr"] else pcol
        where = self.pred(parent, parent)
        return (f"SELECT {parent}.{g} AS g0, count(*) AS cnt, "
                f"count({child}.{ccol}) AS cnt_child, "
                f"CAST(COUNT(DISTINCT {child}.{ccol}) AS BIGINT) AS u0 "
                f"FROM {parent} LEFT JOIN {child} "
                f"ON {child}.{ccol} = {parent}.{pcol} "
                f"WHERE {where} GROUP BY {parent}.{g}")

    def window_q(self):
        """Deterministic window functions: ranks over a TOTAL key
        order and running sums framed by it — single-column keys only
        (verified unique at every SF; lineitem's nominal pair key is
        NOT unique in the fixture), so ties are impossible and both
        engines agree bit-for-bit."""
        t = self.rng.choice([x for x in TABLES
                             if TABLES[x]["lowstr"]
                             and len(TABLES[x]["key"]) == 1])
        c = TABLES[t]
        keys = c["key"][0]
        part = self.rng.choice(c["lowstr"])
        val = self.int_expr(t, None, 0)
        where = self.pred(t, None)
        k = self.rng.choice([10, 25, 100])
        return (f"SELECT {keys}, {part} AS g0, "
                f"CAST(row_number() OVER (PARTITION BY {part} "
                f"ORDER BY {keys}) AS BIGINT) AS rn, "
                f"CAST(SUM({val}) OVER (PARTITION BY {part} "
                f"ORDER BY {keys} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                f"AS BIGINT) AS rsum "
                f"FROM {t} WHERE {where} ORDER BY {keys} LIMIT {k}")

    def rollup_q(self):
        t = self.rng.choice([x for x in TABLES
                             if len(TABLES[x]["lowstr"]) >= 2])
        g1, g2 = self.rng.sample(TABLES[t]["lowstr"], 2)
        where = self.pred(t, None)
        return (f"SELECT {g1} AS g0, {g2} AS g1, count(*) AS cnt, "
                f"CAST(SUM({self.int_expr(t, None)}) AS BIGINT) AS s0 "
                f"FROM {t} WHERE {where} GROUP BY ROLLUP ({g1}, {g2})")

    def union_agg(self):
        t = self.rng.choice([x for x in TABLES if TABLES[x]["lowstr"]])
        g = self.rng.choice(TABLES[t]["lowstr"])
        p1 = self.pred(t, None)
        p2 = self.pred(t, None)
        return (f"SELECT g0, count(*) AS cnt FROM "
                f"(SELECT {g} AS g0 FROM {t} WHERE {p1} "
                f"UNION ALL SELECT {g} AS g0 FROM {t} WHERE {p2}) u "
                f"GROUP BY g0")

    def distinct_q(self):
        tables, conds = self.chain(self.rng.randint(1, 2))
        qualify = len(tables) > 1
        cands = [(t, c) for t in tables for c in TABLES[t]["lowstr"]]
        if not cands:
            return self.grouped_agg()
        pick = self.rng.sample(cands, min(len(cands),
                                          self.rng.randint(1, 2)))
        cols = [f"{t}.{c} AS {c}" if qualify else f"{c} AS {c}"
                for t, c in pick]
        pred_t = self.rng.choice(tables)
        where = self.pred(pred_t, pred_t if qualify else None)
        return (f"SELECT DISTINCT {', '.join(cols)} FROM "
                f"{self.from_clause(tables, conds)} WHERE {where}")

    def limit_q(self):
        tables, conds = self.chain(self.rng.randint(1, 2))
        qualify = len(tables) > 1
        proj = []
        for t in tables:
            c = TABLES[t]
            for col in self.rng.sample(
                    c["int"] + c["str"],
                    min(3, len(c["int"] + c["str"]))):
                proj.append((f"{t}.{col}" if qualify else col, col))
        # declared keys go in the projection for readability, but the
        # ORDER BY is ALL projected columns: rows tied on every output
        # column are identical, so the LIMIT cut is deterministic even
        # where the fixture violates nominal key uniqueness (it does —
        # sf0.01 lineitem has up to 6 rows per (l_orderkey,
        # l_linenumber); seed 3 caught exactly that)
        for t in tables:
            for k in TABLES[t]["key"]:
                r = f"{t}.{k}" if qualify else k
                if (r, k) not in proj:
                    proj.append((r, k))
        seen = set()
        sel = []
        order = []
        for r, a in proj:
            if a not in seen:
                seen.add(a)
                sel.append(f"{r} AS {a}")
                order.append(r)
        pred_t = self.rng.choice(tables)
        where = self.pred(pred_t, pred_t if qualify else None)
        k = self.rng.choice([5, 10, 25, 100])
        return (f"SELECT {', '.join(sel)} FROM "
                f"{self.from_clause(tables, conds)} WHERE {where} "
                f"ORDER BY {', '.join(order)} LIMIT {k}")

    def query(self):
        f = self.rng.choices(
            [self.grouped_agg, self.distinct_q, self.limit_q,
             self.left_join_agg, self.union_agg, self.window_q,
             self.rollup_q],
            weights=[5, 2, 3, 2, 1, 2, 1])[0]
        return f()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 120
    os.makedirs(out_dir, exist_ok=True)
    g = Gen(sf_dir, seed)
    queries = {}
    for i in range(n):
        sql = g.query()
        assert "\t" not in sql and "\n" not in sql
        queries[f"fuzz_{seed}_{i:04d}"] = sql
    with open(f"{out_dir}/queries.tsv", "w") as f:
        for name, sql in queries.items():
            f.write(f"{name}\t{sql}\n")
    with open(f"{out_dir}/oracle_sql.json", "w") as f:
        json.dump(queries, f, indent=1)
    print(f"wrote {n} queries (seed {seed}) to {out_dir}")


if __name__ == "__main__":
    main()
