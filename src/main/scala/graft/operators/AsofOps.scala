package graft.operators

import org.apache.spark.sql.{DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** User-facing as-of join API over the custom [[graft.plans.AsofJoin]]
  * plan (pandas `merge_asof` semantics — the reference stack's users
  * reach for exactly this when aligning event streams; dask has no
  * distributed equivalent, Spark has no native operator). Backward
  * direction: each left row gets the latest right row with
  * `right.on <= left.on` within the same `by` key, or nulls.
  */
object AsofOps {

  /** As-of join `left` to `right` on ordering columns
    * (`leftOn`/`rightOn`) within key columns (`leftBy`/`rightBy`).
    * Column names must be distinct across the two inputs (rename the
    * right side first, as with any Spark self-join).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String,
      leftBy: String, rightBy: String): DataFrame = {
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoin: no column '$n' on the $side side " +
          s"(have ${p.output.map(_.name).mkString(", ")})"))
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    GraftExpressionBridge.ofRows(left.sparkSession,
      AsofJoin(lp, rp,
        attr(lp, leftOn, "left"), attr(rp, rightOn, "right"),
        attr(lp, leftBy, "left"), attr(rp, rightBy, "right")))
  }

  /** Driver entry: for every `click` event, the latest prior (or
    * simultaneous) `view` event of the same user — event-stream
    * alignment, the canonical as-of workload. The view side is
    * pre-aggregated to unique (user, µs) so the "latest" row is
    * well-defined in every engine; times compare as epoch-µs longs
    * (the events convention, [[EventOps]]).
    */
  def clicksWithLastView(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("eus"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "eus")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("eus").as("v_eus"))
      .agg(max("value").as("v_value"))
    asofJoin(clicks, views, leftOn = "eus", rightOn = "v_eus",
      leftBy = "user_id", rightBy = "v_user")
      .select(col("event_id"), col("user_id"), col("eus"),
        col("v_eus").as("matched_eus"), col("v_value").as("matched_value"))
      .orderBy("event_id")
  }

  /** DuckDB oracle for [[clicksWithLastView]] — its native ASOF LEFT
    * JOIN has exactly the backward semantics.
    */
  def clicksWithLastViewSql(): String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS eus
      |  FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id AS v_user, epoch_us(ts) AS v_eus,
      |    MAX(value) AS v_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.eus,
      |  v.v_eus AS matched_eus, v.v_value AS matched_value
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.v_user AND c.eus >= v.v_eus
      |ORDER BY c.event_id""".stripMargin
}
