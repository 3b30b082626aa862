package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Kernels._

/** The 22 TPC-H queries of the reference workload
  * (`/root/reference/benchmark/tpch/queries.py`), re-expressed
  * Spark-first and adapted to the driver fixture schema (FIXTURES.md §B:
  * no `partsupp`, lineitem lacks `l_commitdate`/`l_receiptdate`/
  * `l_shipmode`/`l_shipinstruct`, customers lack `c_phone`/`c_address`,
  * parts lack `p_container`/`p_mfgr`, dates are real timestamps spanning
  * 1995-2001). Where a reference query needs a missing table/column, we
  * keep its *operator shape* (the thing SURVEY §2 inventories) on the
  * columns that exist; each Scaladoc notes the adaptation. Per SURVEY
  * §7.3 we implement the queries' intended SQL semantics, not the
  * reference's pandas bugs (chained-assignment no-ops, literal-string
  * comparisons, undefined names).
  *
  * Scale notes baked into every query:
  *  - filters/projections sit directly on the parquet scan (pushdown);
  *  - dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *    broadcast — either by AQE size estimation or an explicit
  *    `broadcast()` hint where the dimension is provably small;
  *  - top-k uses `orderBy.limit` → `TakeOrderedAndProject` (no global
  *    sort); every LIMIT carries a total tie-breaking order so results
  *    are deterministic;
  *  - all double sums go through [[graft.operators.Kernels.dsum]] so
  *    partial aggregation is order-independent (bit-identical under any
  *    partitioning — the property that keeps results stable from
  *    local[32] to 1000 executors).
  */
object Tpch {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private val disc1: Column = lit(1) - col("l_discount")
  private val revenueExpr: Column = col("l_extendedprice") * disc1
  private val revenueSql = "l_extendedprice * (1 - l_discount)"

  /** Q1 pricing summary — ref `queries.py:14-95` (filter `:27`,
    * multi-agg `:56-66`). The reference relies on pandas groupby's
    * implicit key sort for ORDER BY (`queries.py:55-56`); Spark groupBy
    * does not sort, so the ORDER BY is explicit (SURVEY A11).
    */
  def q1(c: Ctx): DataFrame =
    c.lineitem
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenueExpr).as("sum_disc_price"),
        dsum(revenueExpr * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql(revenueSql)} AS sum_disc_price,
       |  ${dsumSql(s"$revenueSql * (1 + l_tax)")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q2 minimum-cost-supplier pattern — ref `queries.py:98-134`. The
    * original ranks suppliers by `ps_supplycost` (partsupp is absent
    * from the fixtures), so the *grouped-argmax* shape (SURVEY A5, the
    * agg+join-back at `queries.py:125-134`) is kept on `s_acctbal`: per
    * region, the supplier(s) with the maximum account balance. Window
    * max instead of the reference's join-back: one shuffle, no
    * self-join.
    */
  def q2(c: Ctx): DataFrame = {
    val joined = c.supplier
      .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "s_name", "s_acctbal")
    graft.operators.Kernels
      .groupedArgmax(joined, Seq("r_name"), col("s_acctbal"))
      .orderBy("r_name", "s_name")
  }

  val q2Sql: String =
    """WITH sr AS (
      |  SELECT r_name, n_name, s_name, s_acctbal
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT r_name, n_name, s_name, s_acctbal FROM sr
      |WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM sr s2
      |                   WHERE s2.r_name = sr.r_name)
      |ORDER BY r_name, s_name""".stripMargin

  /** Q3 shipping-priority revenue — ref `queries.py:137-222` (BUILDING
    * filter `:161`, joins `:174-177`, `nlargest(10)` `:220`).
    * `o_shippriority` is absent from fixtures → dropped from the group
    * key. Top-10 via `TakeOrderedAndProject`; `l_orderkey` added to the
    * sort as tie-break (the reference's skipped `o_orderdate` sort is
    * restored per SURVEY §7.3).
    */
  def q3(c: Ctx): DataFrame = {
    val cust = c.customer.filter(col("c_mktsegment") === "BUILDING")
    val ord = c.orders.filter(col("o_orderdate") < ts("1997-06-30"))
    val li = c.lineitem.filter(col("l_shipdate") > ts("1997-06-30"))
    val grouped = broadcast(cust)
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(dsum(revenueExpr).as("revenue"))
    graft.operators.Kernels.topK(grouped, 10,
      col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate, ${dsumSql(revenueSql)} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-06-30'
       |  AND l_shipdate > TIMESTAMP '1997-06-30'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderdate, l_orderkey
       |LIMIT 10""".stripMargin

  /** Q4 order-priority checking — ref `queries.py:225-245`. The original
    * predicate `l_commitdate < l_receiptdate` needs columns absent from
    * the fixtures (and is a literal-string-comparison bug in the
    * reference, `queries.py:232`, SURVEY §7.3); the EXISTS shape is kept
    * with `l_shipdate > o_orderdate`. Left-semi join = SQL EXISTS
    * (SURVEY J8) — no row multiplication, no distinct needed.
    */
  def q4(c: Ctx): DataFrame =
    c.orders
      .filter(col("o_orderdate") >= ts("1997-07-01") &&
        col("o_orderdate") < ts("1997-10-01"))
      // EXISTS(l with shipdate > orderdate) ⇔ the order's MAX shipdate
      // beats it: the pre-aggregate collapses map-side to one row per
      // order, so the semi join builds order-level rows instead of the
      // raw fact table
      .join(c.lineitem.groupBy(col("l_orderkey"))
          .agg(max("l_shipdate").as("max_ship")),
        col("o_orderkey") === col("l_orderkey") &&
          col("max_ship") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      |  AND o_orderdate < TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q5 local-supplier volume — ref `queries.py:248-277` (join chain
    * `:251-270`). Note the extra non-key constraint c_nationkey =
    * s_nationkey. region→nation→supplier are broadcast (J9 in SURVEY:
    * tiny dims flowing into every chain).
    */
  def q5(c: Ctx): DataFrame = {
    val asiaNations = broadcast(
      c.nation.join(
        broadcast(c.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    c.lineitem
      .join(c.orders.filter(col("o_orderdate") >= ts("1997-01-01") &&
          col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
      .join(c.customer,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum(revenueExpr).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name, ${dsumSql(revenueSql)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q6 forecast-revenue change — ref `queries.py:280-327` (filters
    * `:300-306`, ungrouped sum `:319`; the reference wraps the scalar
    * back into a dataframe by hand `:314-325` — Spark `df.agg` does this
    * natively, SURVEY A4). Single scan, fully pushed-down predicates, no
    * shuffle beyond the final 1-row reduce.
    */
  def q6(c: Ctx): DataFrame =
    c.lineitem
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.02, 0.04) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q6Sql: String =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND l_discount BETWEEN 0.02 AND 0.04
       |  AND l_quantity < 24""".stripMargin

  /** Q7 volume shipping between two nations — ref `queries.py:330-381`
    * (two-sided nation OR-filter `:374-376`, year extraction via string
    * slice `:371-372` → real `year()` here).
    */
  def q7(c: Ctx): DataFrame = {
    val n1 = c.nation.select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val n2 = c.nation.select(col("n_nationkey").as("n2_key"),
      col("n_name").as("cust_nation"))
    c.lineitem
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(c.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(c.orders, col("l_orderkey") === col("o_orderkey"))
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(dsum(revenueExpr).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate) AS l_year, ${dsumSql(revenueSql)} AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8 national market share — ref `queries.py:384-437`. The
    * reference's `df[mask]['volume'] = 0` is a pandas chained-assignment
    * no-op (`queries.py:429`, SURVEY §7.3); implemented as the intended
    * CASE WHEN indicator (F5). share = exact-sum(case)/exact-sum —
    * division of identical doubles, deterministic.
    */
  def q8(c: Ctx): DataFrame = {
    val euroNations = broadcast(
      c.nation.join(
          broadcast(c.region.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cust_nkey")))
    val suppNation = broadcast(c.nation.select(
      col("n_nationkey").as("supp_nkey"), col("n_name").as("supp_nation")))
    c.lineitem
      .join(broadcast(c.part.filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(c.orders.filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .join(euroNations, col("c_nationkey") === col("cust_nkey"))
      .join(broadcast(c.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("supp_nkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .withColumn("volume", revenueExpr)
      .groupBy("o_year")
      .agg((dsum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))) / dsum(col("volume"))).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    s"""SELECT year(o_orderdate) AS o_year,
       |  ${dsumSql(s"CASE WHEN n1.n_name = 'NATION_3' THEN $revenueSql ELSE 0.0 END")}
       |    / ${dsumSql(revenueSql)} AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |JOIN region ON n2.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY year(o_orderdate)
       |ORDER BY o_year""".stripMargin

  /** Q9 product-type profit — ref `queries.py:440-466` (name filter
    * `:446`, year-string slice `:460` → `year()`). `ps_supplycost` is
    * absent (no partsupp) → cost term adapted to
    * `0.5 * p_retailprice * l_quantity` (0.5 is binary-exact, keeping
    * the per-row double deterministic).
    */
  def q9(c: Ctx): DataFrame =
    c.lineitem
      .join(broadcast(c.part.filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(c.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
      .join(c.orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .withColumn("amount",
        revenueExpr - lit(0.5) * col("p_retailprice") * col("l_quantity"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(dsum(col("amount")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  val q9Sql: String =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  ${dsumSql(s"$revenueSql - 0.5 * p_retailprice * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY n_name, year(o_orderdate)
       |ORDER BY nation, o_year DESC""".stripMargin

  /** Q10 returned-item reporting — ref `queries.py:469-489`
    * (`nlargest(20, 'revenue')` `:488`). Fixture customer lacks
    * c_phone/c_address/c_comment → projected subset. Tie-break by
    * c_custkey for a deterministic top-20.
    */
  def q10(c: Ctx): DataFrame = {
    val grouped = c.lineitem
      .filter(col("l_returnflag") === "R")
      .join(c.orders.filter(col("o_orderdate") >= ts("1997-10-01") &&
          col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(revenueExpr).as("revenue"))
    graft.operators.Kernels.topK(grouped, 20,
      col("revenue").desc, col("c_custkey").asc)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${dsumSql(revenueSql)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-10-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Q11 important-stock identification — ref `queries.py:492-509`.
    * partsupp is absent → the same shape (grouped value vs a fraction of
    * the ungrouped total, i.e. HAVING against a scalar subquery) over
    * lineitem: value(part) = Σ extendedprice·quantity. The 1-row total
    * is broadcast — no driver-side collect (SURVEY §7.4 scale rule).
    */
  def q11(c: Ctx): DataFrame = {
    val valueExpr = col("l_extendedprice") * col("l_quantity")
    val perPart = c.lineitem.groupBy("l_partkey")
      .agg(dsum(valueExpr).as("value"))
    val total = c.lineitem.agg(dsum(valueExpr).as("total_value"))
    // TPC-H scales q11's HAVING fraction by 1/SF; a fixed fraction
    // returns an EMPTY set once SF grows (each part's share of total
    // value shrinks as 1/nparts). Deriving it from the part count —
    // fraction = 1/nparts, i.e. parts above the MEAN part value, the
    // fixed 0.0005's behavior at sf0.01 (953/2000 rows) — keeps the
    // query selective AND non-empty at every SF. value·nparts > total
    // uses an integer multiplier only: both engines run the identical
    // IEEE double ops, so membership is bit-deterministic (no
    // decimal-literal parsing divergence).
    val nparts = c.part.agg(count(lit(1)).as("nparts"))
    perPart
      .crossJoin(broadcast(total)).crossJoin(broadcast(nparts))
      .filter(col("value") * col("nparts") > col("total_value"))
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11Sql: String =
    s"""SELECT l_partkey, ${dsumSql("l_extendedprice * l_quantity")} AS value
       |FROM lineitem
       |GROUP BY l_partkey
       |HAVING ${dsumSql("l_extendedprice * l_quantity")}
       |    * (SELECT COUNT(*) FROM part) >
       |  (SELECT ${dsumSql("l_extendedprice * l_quantity")} FROM lineitem)
       |ORDER BY value DESC, l_partkey""".stripMargin

  /** Q12 shipping modes & order priority — ref `queries.py:512-539`
    * (indicator columns via `Series.where` `:526-531` → CASE WHEN).
    * `l_shipmode` is absent → grouped by `l_returnflag`; the
    * high/low-priority indicator aggregation (F5+A1) is unchanged.
    */
  def q12(c: Ctx): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    c.lineitem
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(c.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(graft.operators.Kernels.indicator(high)).as("high_line_count"),
        sum(graft.operators.Kernels.indicator(!high)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q13 customer order-count distribution — ref `queries.py:542-553`
    * (left merge + two-level aggregation A8). The reference's
    * `NOT LIKE '%special%requests%'` filter needs `o_comment` (absent) →
    * an equivalent exclusion filter on `o_orderpriority`. COUNT of a
    * nullable key counts non-null = orders, exactly pandas `count`.
    */
  def q13(c: Ctx): DataFrame =
    c.customer
      .join(c.orders.filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '5-LOW') o
      |    ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14 promotion effect — ref `queries.py:556-566` (the
    * `df[mask]['revenue'] = 0` chained-assignment bug `:564` →
    * intended CASE WHEN). Fixture p_type values are single words →
    * equality instead of `startswith('PROMO')`.
    */
  def q14(c: Ctx): DataFrame =
    c.lineitem
      .filter(col("l_shipdate") >= ts("1997-09-01") &&
        col("l_shipdate") < ts("1997-10-01"))
      .join(broadcast(c.part), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO", revenueExpr).otherwise(lit(0.0))) /
        dsum(revenueExpr)).as("promo_revenue"))

  val q14Sql: String =
    s"""SELECT 100.0 *
       |  ${dsumSql(s"CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE 0.0 END")}
       |  / ${dsumSql(revenueSql)} AS promo_revenue
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
       |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  /** Q15 top supplier — ref `queries.py:569-581` (max-revenue argmax
    * `:576-577`; the reference returns an undefined name `revSup`
    * `:580`, SURVEY §7.3 — intended result implemented). The 1-row max
    * is broadcast for the equality filter.
    */
  def q15(c: Ctx): DataFrame = {
    val rev = c.lineitem
      .filter(col("l_shipdate") >= ts("1997-10-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(revenueExpr).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(c.supplier), col("supplier_no") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, ${dsumSql(revenueSql)} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-10-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM revenue JOIN supplier ON supplier_no = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  /** Q16 parts/supplier relationship — ref `queries.py:584-610`
    * (count-distinct intent `:607-609`, startswith-exclusion `:588`).
    * partsupp absent → supplier-part pairs observed in lineitem;
    * exact COUNT(DISTINCT l_suppkey) (SURVEY A6 — at 100 TB swap for
    * `approx_count_distinct`, here the oracle needs exactness).
    */
  def q16(c: Ctx): DataFrame =
    c.lineitem
      .join(broadcast(c.part.filter(col("p_brand") =!= "Brand#5" &&
          col("p_size").isin(1, 5, 14, 23, 36, 45, 49, 3))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5'
      |  AND p_size IN (1, 5, 14, 23, 36, 45, 49, 3)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q17 small-quantity-order revenue — ref `queries.py:613-630`
    * (per-part avg then `l_quantity < 0.2*avg`, final `sum/7`).
    * `p_container` absent → brand-only part filter. The per-part avg is
    * an aggregate joined back on the part key — partial agg + broadcast
    * of the (tiny) per-part table.
    */
  def q17(c: Ctx): DataFrame = {
    val parts = broadcast(c.part.filter(col("p_brand") === "Brand#1"))
    // semi-join reduction (same as TpchFull.q17): per-part averages
    // computed over lineitem pre-filtered to the qualifying parts —
    // identical semantics, agg input shrunk by the part selectivity
    val qualifying = c.lineitem
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQty = qualifying.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((lit(0.2) * davg(col("l_quantity"))).as("qty_threshold"))
    qualifying
      .join(broadcast(avgQty), col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN (SELECT l_partkey AS ap_partkey,
       |        0.2 * ${davgSql("l_quantity")} AS qty_threshold
       |      FROM lineitem GROUP BY l_partkey) a
       |  ON l_partkey = ap_partkey
       |WHERE p_brand = 'Brand#1'
       |  AND l_quantity < qty_threshold""".stripMargin

  /** Q18 large-volume customers — ref `queries.py:633-648` (groupby sum
    * qty `:639`, threshold filter `:642`, join back to orders/customer
    * `:644-645`). Threshold 250 ≈ p99 of per-order quantity in the
    * fixtures (TPC-H's 300 exceeds the fixture max of 458 too rarely).
    */
  def q18(c: Ctx): DataFrame = {
    val big = c.lineitem.groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    val grouped = c.orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty")
    graft.operators.Kernels.topK(grouped, 100,
      col("o_totalprice").desc, col("o_orderdate").asc, col("o_orderkey").asc)
  }

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM orders
       |JOIN (SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING ${dsumSql("l_quantity")} > 250) b
       |  ON o_orderkey = b.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
       |LIMIT 100""".stripMargin

  /** Q19 discounted revenue, disjunctive predicates — ref
    * `queries.py:651-688` (three OR'd brand/size/quantity clause groups
    * `:671-684`; chained-assignment bug avoided per SURVEY §7.3).
    * `l_shipmode`/`l_shipinstruct` absent → clauses on columns present.
    */
  def q19(c: Ctx): DataFrame =
    c.lineitem
      .join(broadcast(c.part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 25) &&
          col("l_quantity").between(20, 30)))
      .agg(dsum(revenueExpr).as("revenue"))

  val q19Sql: String =
    s"""SELECT ${dsumSql(revenueSql)} AS revenue
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
       |       AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
       |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q20 potential part promotion — ref `queries.py:691-713`
    * (`unique()` + inner merge = the semi-join workaround, SURVEY J8 —
    * expressed as a real left-semi join here). Suppliers who moved more
    * than 40 units of any single 'red' part in 1997.
    */
  def q20(c: Ctx): DataFrame = {
    val qualified = c.lineitem
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(c.part.filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(dsum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 40)
    // the aggregated+filtered qualified set is tiny → broadcast it so
    // the semi-join never sort-merges (the suite's last non-broadcast
    // join otherwise)
    c.supplier
      .join(broadcast(qualified), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_name", "s_suppkey")
  }

  val q20Sql: String =
    s"""SELECT s_suppkey, s_name, s_acctbal
       |FROM supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '%red%'
       |    AND l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING ${dsumSql("l_quantity")} > 40)
       |ORDER BY s_name, s_suppkey""".stripMargin

  /** Q21 suppliers who kept orders waiting — ref `queries.py:716-783`
    * (intended query is the commented Spark sketch `:755-782`; the
    * pandas version returns an intermediate, SURVEY §7.3).
    * l_receiptdate/l_commitdate absent → "waiting" = this supplier's
    * line shipped strictly after every other supplier's line of the same
    * multi-supplier 'F' order. EXISTS → left-semi, NOT EXISTS →
    * left-anti on self-joined lineitem aliases.
    */
  def q21(c: Ctx): DataFrame = {
    val l1 = c.lineitem.select(
      col("l_orderkey").as("l1_orderkey"),
      col("l_suppkey").as("l1_suppkey"),
      col("l_shipdate").as("l1_shipdate"))
    val l2 = c.lineitem.select(
      col("l_orderkey").as("l2_orderkey"),
      col("l_suppkey").as("l2_suppkey"))
    val l3 = c.lineitem.select(
      col("l_orderkey").as("l3_orderkey"),
      col("l_suppkey").as("l3_suppkey"),
      col("l_shipdate").as("l3_shipdate"))
    l1.join(c.orders.filter(col("o_orderstatus") === "F"),
        col("l1_orderkey") === col("o_orderkey"))
      .join(l2,
        col("l2_orderkey") === col("l1_orderkey") &&
          col("l2_suppkey") =!= col("l1_suppkey"),
        "left_semi")
      .join(l3,
        col("l3_orderkey") === col("l1_orderkey") &&
          col("l3_suppkey") =!= col("l1_suppkey") &&
          col("l3_shipdate") > col("l1_shipdate"),
        "left_anti")
      .join(broadcast(c.supplier), col("l1_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Q22 global sales opportunity — ref `queries.py:786-831` (intended
    * semantics in the commented sketch `:810-830`: above-average
    * positive balance + NOT EXISTS orders; the pandas version never
    * substrings cntrycode, SURVEY §7.3). `c_phone` absent → grouped by
    * nation instead of phone-prefix country code; NOT EXISTS restricted
    * to recent orders so the anti-join is non-trivial (every fixture
    * customer has some order).
    */
  def q22(c: Ctx): DataFrame = {
    val avgBal = c.customer.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    c.customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(c.orders.filter(col("o_orderdate") >= ts("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("n_name")
  }

  val q22Sql: String =
    s"""SELECT n_name, COUNT(*) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer
       |                   WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** name → query, mirroring `queries.py:840-863` `by_number`. */
  val queries: Map[String, Ctx => DataFrame] = Map(
    "q1" -> q1 _, "q2" -> q2 _, "q3" -> q3 _, "q4" -> q4 _,
    "q5" -> q5 _, "q6" -> q6 _, "q7" -> q7 _, "q8" -> q8 _,
    "q9" -> q9 _, "q10" -> q10 _, "q11" -> q11 _, "q12" -> q12 _,
    "q13" -> q13 _, "q14" -> q14 _, "q15" -> q15 _, "q16" -> q16 _,
    "q17" -> q17 _, "q18" -> q18 _, "q19" -> q19 _, "q20" -> q20 _,
    "q21" -> q21 _, "q22" -> q22 _)

  val oracles: Map[String, String] = Map(
    "q1" -> q1Sql, "q2" -> q2Sql, "q3" -> q3Sql, "q4" -> q4Sql,
    "q5" -> q5Sql, "q6" -> q6Sql, "q7" -> q7Sql, "q8" -> q8Sql,
    "q9" -> q9Sql, "q10" -> q10Sql, "q11" -> q11Sql, "q12" -> q12Sql,
    "q13" -> q13Sql, "q14" -> q14Sql, "q15" -> q15Sql, "q16" -> q16Sql,
    "q17" -> q17Sql, "q18" -> q18Sql, "q19" -> q19Sql, "q20" -> q20Sql,
    "q21" -> q21Sql, "q22" -> q22Sql)
}
