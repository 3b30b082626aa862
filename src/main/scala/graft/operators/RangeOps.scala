package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the second whole-operator join class the
  * brief calls out beyond the as-of join ([[graft.plans.AsofJoinPlan]]).
  * Pairs a left row with every right row whose timestamp falls in a
  * half-open band after the left row's timestamp:
  *
  *   (l, r) kept  ⇔  equi-keys match  ∧  rT − lT ∈ (loMicros, hiMicros]
  *
  * == Why not a plain theta-join ==
  * Spark plans `l.join(r, keys ∧ rT between …)` as an equi-join on the
  * keys with the band as a post-join filter — fine when the equi keys
  * are selective, quadratic per key group when they are not (and a
  * BroadcastNestedLoopJoin when there are no equi keys at all). The
  * scale shape is *band bucketing* (the same trick the reference family
  * of systems uses for interval joins): quantize time into buckets of
  * exactly the band width, replicate each LEFT row to the (at most two)
  * buckets its band can touch, equi-join on (keys, bucket), then refine
  * with the exact predicate. Each pair is examined in exactly one
  * bucket collision, the join is a pure hash equi-join of ≤2× left ×
  * 1× right rows, and the shuffle key (keys, bucket) spreads a hot equi
  * key across time — no quadratic blow-up, no nested-loop fallback.
  *
  * Time columns are epoch MICROSECONDS (`unix_micros(ts)` upstream).
  * Bucket ids use true floor division (`(a - pmod(a, w)) div w`), so
  * negative band offsets (look-back joins, `loMicros < 0`) and
  * pre-epoch timestamps bucket correctly — `div` alone truncates
  * toward zero, which would misplace negative operands. Column names
  * must be disjoint apart from the equi keys.
  */
object RangeOps {

  /** Banded range join (see object doc). `left`/`right` must share the
    * `keys` columns; `leftTimeUs`/`rightTimeUs` name their epoch-µs
    * columns. Requires `hiMicros > loMicros` and non-negative times.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeUs: String, rightTimeUs: String,
      loMicros: Long, hiMicros: Long): DataFrame = {
    require(hiMicros > loMicros, "range join needs a non-empty band")
    val w = hiMicros - loMicros
    // floor division (pmod is always non-negative), exact in Long —
    // plain `div` truncates toward zero and misbuckets negative values
    def fdiv(a: String): String = s"(($a) - pmod($a, ${w}L)) div ${w}L"
    // a left band (lT+lo, lT+hi] of width w touches at most two
    // width-w buckets; array_distinct drops the duplicate when the
    // band sits inside one bucket
    val lb = left.withColumn("__band", explode(array_distinct(array(
      expr(fdiv(s"($leftTimeUs + ${loMicros}L)")),
      expr(fdiv(s"($leftTimeUs + ${hiMicros}L)"))))))
    val rb = right.withColumn("__band", expr(fdiv(rightTimeUs)))
    lb.join(rb, keys :+ "__band")
      .filter(col(rightTimeUs) - col(leftTimeUs) > loMicros &&
        col(rightTimeUs) - col(leftTimeUs) <= hiMicros)
      .drop("__band")
  }

  /** [[rangeJoin]] with band salting — for the keyless (or hot-key)
    * case where one time band holds a burst: the left side gets a
    * round-robin salt, the right side is replicated once per salt
    * value, and the salt joins the bucket key, spreading a hot
    * (keys, band) bucket over `saltFactor` reducers. Same result set;
    * use when a burst concentrates the shuffle (the same trade
    * [[Kernels.saltedJoin]] makes for equi-joins).
    */
  def rangeJoinSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeUs: String, rightTimeUs: String,
      loMicros: Long, hiMicros: Long, saltFactor: Int = 8): DataFrame = {
    val lb = left.withColumn("__rsalt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val rb = right.withColumn("__rsalt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    rangeJoin(lb, rb, keys :+ "__rsalt", leftTimeUs, rightTimeUs,
      loMicros, hiMicros).drop("__rsalt")
  }

  /** Driver entry: for every `error` event, the `click` events by the
    * same user within the following `windowSeconds` — aggregated per
    * user (pair count, errors that saw a follow-up click, distinct
    * clicks matched). The DuckDB oracle states the same join as a raw
    * inequality join, proving the banded plan's semantics bit-for-bit.
    */
  def errorClickFollowups(events: DataFrame,
      windowSeconds: Long = 14400): DataFrame = {
    val hiUs = windowSeconds * 1000000L
    val e = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        unix_micros(col("ts")).as("err_us"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    rangeJoin(e, c, Seq("user_id"), "err_us", "click_us", 0L, hiUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("err_id")).as("n_errors_with_click"),
        countDistinct(col("click_id")).as("n_clicks_after_error"))
      .orderBy("user_id")
  }

  def errorClickFollowupsSql(windowSeconds: Long = 14400): String = {
    val hiUs = windowSeconds * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us
       |  FROM events WHERE event_type = 'error'),
       |c AS (
       |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
       |  FROM events WHERE event_type = 'click')
       |SELECT e.user_id, COUNT(*) AS n_pairs,
       |  COUNT(DISTINCT err_id) AS n_errors_with_click,
       |  COUNT(DISTINCT click_id) AS n_clicks_after_error
       |FROM e JOIN c ON e.user_id = c.user_id
       |  AND c.click_us - e.err_us > 0
       |  AND c.click_us - e.err_us <= $hiUs
       |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin
  }
}
