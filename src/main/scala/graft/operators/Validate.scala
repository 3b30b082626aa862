package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative constraint audit — the data-quality report a
  * production ingest runs before trusting a drop: domain/enum/range
  * rules as conditional aggregates (ONE pass per table, map-side
  * partials), uniqueness as count-vs-distinct, referential integrity
  * as an anti-join count. The report COUNTS violations rather than
  * asserting zero — drift detection, not a gate; both engines count
  * identically whatever the fixture contains.
  *
  * Scale shape: per-table rule groups collapse in a single hash-agg
  * pass each; the FK rule is one equi-anti-join on the key (AQE
  * handles skew); output is a dozen rows. Nothing quadratic, no
  * windows, no driver-side data beyond the report itself.
  */
object Validate {

  /** (rule, n_checked, n_violations), ordered by rule. */
  def constraintReport(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, documents: DataFrame): DataFrame = {
    def viol(cond: org.apache.spark.sql.Column) =
      sum(when(cond, 1L).otherwise(0L))
    // ONE aggregate over lineitem feeds both the rule rows and the FK
    // rule's n_checked (identical agg subtrees — exchange reuse
    // collapses them; never a third scan just for a count)
    val liAgg = lineitem.agg(
      count(lit(1)).as("n"),
      viol(col("l_quantity") < 1 || col("l_quantity") > 50).as("v_qty"),
      viol(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"),
      viol(!col("l_returnflag").isin("A", "N", "R")).as("v_flag"),
      viol(col("l_shipdate").isNull).as("v_ship"))
    val li = liAgg
      .select(explode(array(
        struct(lit("lineitem.quantity_in_1_50").as("rule"),
          col("n").as("n_checked"), col("v_qty").as("n_violations")),
        struct(lit("lineitem.discount_in_0_0.1").as("rule"),
          col("n").as("n_checked"), col("v_disc").as("n_violations")),
        struct(lit("lineitem.returnflag_enum").as("rule"),
          col("n").as("n_checked"), col("v_flag").as("n_violations")),
        struct(lit("lineitem.shipdate_not_null").as("rule"),
          col("n").as("n_checked"), col("v_ship").as("n_violations"))))
        .as("r"))
    val ord = orders.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
      viol(col("o_totalprice") <= 0).as("v_price"))
      .select(explode(array(
        struct(lit("orders.orderkey_unique").as("rule"),
          col("n").as("n_checked"), col("v_uniq").as("n_violations")),
        struct(lit("orders.totalprice_positive").as("rule"),
          col("n").as("n_checked"), col("v_price").as("n_violations"))))
        .as("r"))
    val cust = customer.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("c_custkey"))).as("v_uniq"))
      .select(explode(array(
        struct(lit("customer.custkey_unique").as("rule"),
          col("n").as("n_checked"), col("v_uniq").as("n_violations"))))
        .as("r"))
    val docs = documents.agg(
      count(lit(1)).as("n"),
      viol(col("n_chars") =!= length(col("text"))).as("v_len"))
      .select(explode(array(
        struct(lit("documents.n_chars_matches_text").as("rule"),
          col("n").as("n_checked"), col("v_len").as("n_violations"))))
        .as("r"))
    // FK: every lineitem references an existing order — anti-join count
    val fkV = lineitem
      .join(orders.select(col("o_orderkey").as("k")).distinct(),
        col("l_orderkey") === col("k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val fk = liAgg.select(col("n").as("n_checked")).crossJoin(fkV)
      .select(struct(lit("lineitem.orderkey_references_orders").as("rule"),
        col("n_checked"), col("n_violations")).as("r"))
    li.unionAll(ord).unionAll(cust).unionAll(docs).unionAll(fk)
      .select(col("r.rule").as("rule"),
        col("r.n_checked").cast("bigint").as("n_checked"),
        col("r.n_violations").cast("bigint").as("n_violations"))
      .orderBy("rule")
  }

  def constraintReportSql: String =
    """SELECT rule, n_checked, n_violations FROM (
      |  SELECT 'lineitem.quantity_in_1_50' AS rule,
      |    count(*) AS n_checked,
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.discount_in_0_0.1', count(*),
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.returnflag_enum', count(*),
      |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.shipdate_not_null', count(*),
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'orders.orderkey_unique', count(*),
      |    count(*) - COUNT(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'orders.totalprice_positive', count(*),
      |    CAST(SUM(CASE WHEN o_totalprice <= 0
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'customer.custkey_unique', count(*),
      |    count(*) - COUNT(DISTINCT c_custkey) FROM customer
      |  UNION ALL
      |  SELECT 'documents.n_chars_matches_text', count(*),
      |    CAST(SUM(CASE WHEN n_chars <> length(text)
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT 'lineitem.orderkey_references_orders',
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |       WHERE o.o_orderkey = l.l_orderkey))
      |) t ORDER BY rule""".stripMargin
}
