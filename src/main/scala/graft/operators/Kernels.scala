package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Operator-kernel layer: the small set of helpers where the reference's
  * dask/pandas semantics differ from Spark defaults (SURVEY.md §7.1 item 3),
  * plus the engine's deterministic-aggregation convention.
  *
  * == Deterministic aggregation (`dsum`/`davg`) ==
  * Spark and the DuckDB oracle sum partitions in different orders; IEEE
  * double addition is not associative, so a plain `sum(double)` can differ
  * in the last bits between engines and break hash comparison. Every money
  * column in the fixtures is an exact 2-decimal value, so per-row
  * expressions (products of ≤3 such factors) have ≤6 decimal digits and
  * cast losslessly to `DECIMAL(25,6)`. Decimal summation is exact and
  * order-independent → both engines produce bit-identical results; the
  * final cast back to double keeps the public schema simple. At 100 TB the
  * same property is what makes partial (map-side) aggregation safe to
  * re-order freely.
  */
object Kernels {

  /** Fixed-point carrier for exact, order-independent summation. */
  val ExactDec: DecimalType = DecimalType(25, 6)

  /** Order-independent sum of a double expression (see class doc). */
  def dsum(e: Column): Column = sum(e.cast(ExactDec)).cast(DoubleType)

  /** Order-independent mean: exact sum / count — division of identical
    * operands is deterministic across engines.
    */
  def davg(e: Column): Column = dsum(e) / count(e)

  /** SQL fragment equivalents of dsum/davg for the DuckDB oracle. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(25,6))) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"

  /** 0/1 indicator column — the reference builds these with
    * `Series.where` (`/root/reference/benchmark/tpch/queries.py:526-531`
    * Q12, `:546-547` Q13, `:660-668` Q19); in Spark it is CASE WHEN,
    * which stays inside whole-stage codegen.
    */
  def indicator(cond: Column): Column = when(cond, lit(1)).otherwise(lit(0))

  /** Distributed top-k by sort keys — the reference's `nlargest(n)`
    * (`queries.py:220` Q3 n=10, `:488` Q10 n=20). Spark plans
    * `orderBy(...).limit(n)` as `TakeOrderedAndProject`: per-partition
    * heaps + driver merge of k rows, never a full sort/shuffle — exactly
    * the scale-safe shape. Callers must pass a tie-breaking key so the
    * k-th row is deterministic.
    */
  def topK(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.orderBy(keys: _*).limit(n)

  /** Grouped argmax (A5 in SURVEY §2.6): rows attaining the per-group
    * extremum of `value`. The reference expresses this as agg + equi-join
    * back (`queries.py:125-134` Q2 min supplycost, `:576-577` Q15 max
    * revenue). A window `max().over(partitionBy)` avoids the self-join:
    * one shuffle on the group keys instead of two joins.
    *
    * Window bound (r10 convention): callers must guarantee per-group
    * row counts bounded by SCHEMA, not data volume — q2: ≤4 partsupp
    * rows per part (dbgen construction); q15: one row per supplier.
    * For unbounded groups use `max_by`/`min_by` aggregates (the
    * cluster-resolution pattern) instead of this kernel.
    */
  def groupedArgmax(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__grp_max", max(value).over(w))
      .filter(value === col("__grp_max"))
      .drop("__grp_max")
  }

  /** Salted two-phase aggregation for skewed group keys: pre-aggregate
    * by (key, salt) — spreading each hot key over `saltFactor` partial
    * reducers — then combine by key. Correct for any algebraic
    * aggregate; exposed for dsum whose decimal carrier makes the
    * two-phase split bit-exact. (Catalyst's partial aggregation already
    * does map-side combine; salting additionally splits the REDUCE side
    * of a hot key.)
    */
  def saltedDsum(df: DataFrame, keys: Seq[String], valueExpr: Column,
      alias: String, saltFactor: Int = 8): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueExpr.cast(ExactDec)).as("__psum"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast(DoubleType).as(alias))
  }

  /** Salted equi-join for skewed keys: the big side gets a synthetic
    * salt (round-robin over row ids — NOT a function of the key, so one
    * hot key spreads over `saltFactor` reducers); the small side is
    * replicated once per salt value. AQE's skew-join splitting handles
    * most cases automatically; this is the manual control for joins AQE
    * can't rewrite (e.g. under a required distribution).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      joinType: String = "inner", saltFactor: Int = 8): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    val cond = (keys.map(k => bigS(k) === smallS(k)) :+
      (bigS("__salt") === smallS("__salt"))).reduce(_ && _)
    val joined = bigS.join(smallS, cond, joinType)
      .drop(smallS("__salt")).drop(bigS("__salt"))
    keys.foldLeft(joined)((df, k) => df.drop(smallS(k)))
  }

  /** Distributed EXACT global rank (order statistics) — `row_number()
    * over (order by …)` without the single-reducer unpartitioned
    * window that Spark would otherwise plan (WindowExec requires
    * exactly one partition when `partitionBy` is empty, so the naive
    * form funnels the whole corpus through one task — the same
    * anti-pattern the cluster-resolution rework removed in r9).
    *
    * Shape: range-repartition on the total order (the same exchange a
    * distributed `orderBy` uses — sampled boundaries, balanced shards,
    * ties split across shards because callers pass a tie-breaking key),
    * tag rows with their shard, then
    *
    *   rank = (rows in earlier shards) + (row_number within my shard).
    *
    * The per-shard counts form a ledger of ≤`width` rows whose prefix
    * sum runs in an unpartitioned window over that TINY frame only
    * (the packSequences block-ledger pattern); the corpus-side window
    * partitions on the shard tag, so every task sorts one balanced
    * range. The result is boundary-independent — whatever shard split
    * the sampler picks, "rows strictly before mine" is the same — which
    * is what makes the rank deterministic and DuckDB-oracle-checkable.
    *
    * EAGER by construction (documented per the r9 convention):
    * `spark_partition_id()` ties correctness to ONE physical
    * materialization — if the ledger and the rank branch recomputed the
    * range exchange independently, a re-sampled boundary set would
    * desynchronize offsets from shard tags — so the shard-tagged frame
    * is eagerly `localCheckpoint`ed; constructing a frame from this
    * kernel runs that job. Callers should project to the columns they
    * need first (the checkpoint stores them, and the frame crosses TWO
    * exchanges: the range repartition, then — because the checkpoint's
    * range partitioning cannot satisfy the window's
    * clustered-by-__shard requirement — one hash exchange on the shard
    * tag; both move only the projected rank frame, never the corpus).
    *
    * Output: input columns + `out` (BIGINT rank, 1-based over `order`)
    * + `n_total` (BIGINT row count, same on every row — callers bucket
    * by `rank`/`n_total` without a second pass).
    */
  def globalRank(df: DataFrame, order: Seq[Column], out: String = "rank",
      width: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val w =
      if (width > 0) width
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(w, order: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint(true)
    val ledger = Window.orderBy("__shard")
    val offsets = ranged.groupBy("__shard")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum("__cnt").over(
          ledger.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_total",
        sum("__cnt").over(ledger.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__shard", "__off", "n_total")
    ranged.join(broadcast(offsets), "__shard")
      .withColumn(out,
        row_number().over(
          Window.partitionBy("__shard").orderBy(order: _*)).cast("bigint") +
          col("__off"))
      .drop("__shard", "__off")
  }

  /** Distributed EXACT quantiles by rank selection over
    * [[globalRank]] — the scalable replacement for Spark's built-in
    * `percentile` aggregate, whose buffer collects EVERY value into
    * one aggregation state (fine at fixture scale, an executor OOM at
    * corpus scale; see the `stats_quantiles` scaladoc note this
    * kernel discharges). Quantile `q` is defined by rank:
    * `value at row max(1, ceil(q·n))` of the total order
    * `(value, tie…)` — the discontinuous (type-1) quantile, which is
    * exactly restatable in the oracle as a ROW_NUMBER equality, so the
    * result is bit-identical cross-engine with NO interpolation
    * arithmetic to reconcile.
    *
    * Shape: the ranked frame is filtered to the |qs| target ranks by a
    * codegen'd `array_contains` over ranks derived from `n_total`
    * (map-side, no extra pass), then the handful of surviving rows
    * fan out to their matching q values. Inherits [[globalRank]]'s
    * eagerness and its two narrow-frame exchanges; `n − 1` of the `n`
    * rows die in the filter without ever reaching the fan-out.
    */
  def exactQuantiles(df: DataFrame, value: Column, ties: Seq[Column],
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val ranked = globalRank(
      df.select((value.as("value") +: ties.zipWithIndex.map {
        case (t, i) => t.as(s"__t$i")
      }): _*),
      col("value") +: ties.indices.map(i => col(s"__t$i")), "rnk")
    val qArr = s"array(${qs.mkString("D, ")}D)"
    val targets =
      s"transform($qArr, q -> greatest(1L, cast(ceil(q * n_total) as bigint)))"
    ranked
      .filter(expr(s"array_contains($targets, rnk)"))
      .select(explode(expr(qArr)).as("q"), col("rnk"), col("value"),
        col("n_total"))
      .filter(col("rnk") ===
        greatest(lit(1L), ceil(col("q") * col("n_total")).cast("bigint")))
      .select(col("q"), col("rnk"), col("value"))
      .orderBy("q", "rnk")
  }

  /** Equi-join with pandas-style collision suffixes (J7 in SURVEY §2.5):
    * dask `merge` auto-suffixes colliding columns (`queries.py:134`
    * filters on `ps_supplycost_y`; `suffixes=` at `:235,401,508`). Spark
    * has no auto-suffix, so we rename right-side collisions
    * deterministically before joining.
    */
  def joinSuffixed(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      joinType: String = "inner",
      rightSuffix: String = "_right"): DataFrame = {
    val collisions = right.columns.toSet
      .intersect(left.columns.toSet) -- rightKeys.toSet
    val renamed = collisions.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, c + rightSuffix))
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === renamed(r) }
      .reduce(_ && _)
    left.join(renamed, cond, joinType)
  }
}
