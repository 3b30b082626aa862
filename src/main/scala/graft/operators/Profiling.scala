package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus observability: a declarative column profiler and a
  * snapshot-drift report (PSI / KL divergence), plus the persisted
  * reference-profile store that turns the drift report into a
  * production ingest monitor ("has this week's crawl shifted the
  * source / language / length mix?").
  *
  * The reference exposes dataset-shape introspection as
  * `DataFrame.describe`-style per-column summaries and leaves drift
  * to the user; here both are first-class, oracle-checked operators
  * (the reference's nearest analogue is the per-partition statistics
  * used by its scheduler for rebalancing,
  * `/root/reference/distributed/scheduler.py:5743` `get_worker_load`
  * family — per-key counts, never content profiles).
  *
  * Scale notes (100 TB):
  *  - [[columnProfile]]'s exact distinct counts are two-level
  *    hash-aggs keyed on (column, value) — map-side combine collapses
  *    hot values per partition before the shuffle, so skew is bounded
  *    by per-partition distinct counts, and the shuffled volume is
  *    the number of DISTINCT (column, value) pairs, not the row
  *    count. That is the inherent cost of exactness; at 100 TB the
  *    approximate path is the persisted HLL sketch store
  *    ([[Sketches]]), which answers the same question in KB.
  *  - [[driftReport]] shuffles only (feature, bin) partial counts —
  *    dictionary-sized by construction (|sources| + |langs| + length
  *    buckets) — and every downstream step is over that tiny frame.
  *  - the profile store follows the store-family contract
  *    (docs/STORES.md): atomic temp+rename publish, `_SUCCESS`
  *    completeness gate, additive append with the applied-batch
  *    watermark inside the publish, dictionary-sized republish.
  */
object Profiling {

  // --- column profiler -------------------------------------------------

  /** Per-column profile: row/null/exact-distinct counts and
    * min/max (rendered as strings; numeric columns are min/max'd
    * numerically BEFORE rendering, so "9" < "10" behaves as a number,
    * not a byte string). One unpivoted two-level agg for the
    * null/distinct side + one single-row ungrouped agg for min/max —
    * both fully partial-aggregated, nothing collected.
    *
    * Rendering restriction: pass only columns whose string rendering
    * is engine-portable (strings, integer types). Floating-point
    * rendering differs across engines — profile those via their exact
    * bit patterns or a decimal cast upstream.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val unpivoted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"),
        col(c).cast("string").as("v"))): _*)).as("cv"))
      .select(col("cv.column_name").as("column_name"), col("cv.v").as("v"))
    // level 1: collapse to distinct (column, value) with multiplicity;
    // level 2: dictionary-sized per-column rollup
    val grouped = unpivoted.groupBy("column_name", "v")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("column_name")
      .agg(sum("cnt").as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(lit(0L)))
          .as("n_nulls"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"))
    // seed frame of the requested column names: on an EMPTY input the
    // explode/groupBy side yields zero rows, while the per-column SQL
    // oracle's ungrouped aggregates always yield one row per column —
    // the left join keeps the shapes identical (n=0, null min/max)
    val seed = {
      import df.sparkSession.implicits._
      cols.toDF("column_name")
    }
    val counts = seed.join(broadcast(grouped), Seq("column_name"), "left")
      .select(col("column_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
    // single-row min/max agg (numeric semantics), reshaped to rows
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val mm = one.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"),
        col(s"min_$c").as("min_repr"),
        col(s"max_$c").as("max_repr"))): _*)).as("m"))
      .select(col("m.column_name").as("column_name"),
        col("m.min_repr").as("min_repr"), col("m.max_repr").as("max_repr"))
    counts.join(broadcast(mm), Seq("column_name"), "left")
      .orderBy("column_name")
  }

  /** Driver entry: profile every `documents` column (all string /
    * bigint — portable renderings).
    */
  def columnProfileEntry(docs: DataFrame): DataFrame =
    columnProfile(docs, Seq("doc_id", "lang", "n_chars", "source", "text"))

  val columnProfileSql: String = {
    def per(c: String) =
      s"""SELECT '$c' AS column_name,
         |  COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_repr,
         |  CAST(MAX($c) AS VARCHAR) AS max_repr
         |FROM documents""".stripMargin
    Seq("doc_id", "lang", "n_chars", "source", "text").map(per)
      .mkString("WITH p AS (\n", "\nUNION ALL\n",
        ")\nSELECT * FROM p ORDER BY column_name")
  }

  // --- drift report ----------------------------------------------------

  /** (feature, bin) rows for the three monitored dimensions: source,
    * lang, and the 64-char length bucket. One narrow projection +
    * explode — no shuffle until the caller aggregates.
    */
  def featureBins(docs: DataFrame): DataFrame =
    docs.select(explode(array(
      struct(lit("lang").as("feature"), col("lang").as("bin")),
      struct(lit("len_bucket").as("feature"),
        expr("cast(n_chars div 64 as string)").as("bin")),
      struct(lit("source").as("feature"), col("source").as("bin"))))
      .as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bin").as("bin"))

  /** Population-stability / KL drift between a reference snapshot and
    * a current snapshot, per monitored feature:
    *
    *   psi = Σ_bins (p − q) · ln(p / q),   kl = Σ_bins p · ln(p / q)
    *
    * over add-1 (Laplace) smoothed bin probabilities
    * p = (c_ref + 1) / (n_ref + B), q = (c_cur + 1) / (n_cur + B)
    * with B = |union bins| — smoothing makes both sums well-defined
    * when a bin exists on only one side (the interesting case: a new
    * source appearing, a language vanishing).
    *
    * Exactness (r14 — libm-free by construction): within a feature,
    * p/q is the EXACT integer ratio
    * (c_ref+1)·(n_cur+B) : (c_cur+1)·(n_ref+B), and ln(p/q) is
    * computed on the dictionary-sized bins frame by the fixed-point
    * integer kernel [[graft.functions.IntegerLn]] — the same BIGINT
    * recurrence in Spark and the DuckDB oracle, bit-identical at 1e-9
    * resolution with no dependence on either engine's math library.
    * (r12/r13 lesson: the driver's DuckDB `ln` differs from the JVM's
    * by far more than 1 ulp — coarsening a libm output was a losing
    * arms race; see VERDICT r13.) Each scored term is then ONE IEEE
    * chain on deterministic inputs — (p−q)·lr9d with p, q single IEEE
    * divisions of exact integers and lr9d the exact cast of the
    * integer log — snapped to the 1e-9 BIGINT grid and summed
    * order-free; `max_abs_diff` is pure exact-input arithmetic and is
    * emitted unrounded.
    *
    * Emission stays at the r13 1e-6 resolution (`sum div 1000 / 1e6`,
    * clamped nonneg first) so downstream consumers and alert
    * thresholds see unchanged semantics — but the value is now
    * deterministic at ANY resolution; the coarsening is a formatting
    * choice, not a cross-engine bet.
    *
    * Shuffles: ONE hash-agg over (feature, bin) partial counts; the
    * rest runs on the dictionary-sized bins frame with a broadcast
    * totals join. No windows.
    */
  def driftReport(ref: DataFrame, cur: DataFrame): DataFrame =
    driftFromBins(twoSnapshotBins(featureBins(ref), featureBins(cur)))

  /** The shared PSI/KL scoring tail over a (feature, bin, c_ref,
    * c_cur) frame — ONE copy of the smoothing/grid math, so
    * [[driftReport]] and [[driftFromStore]] cannot drift apart.
    */
  private def driftFromBins(bins: DataFrame): DataFrame = {
    val tot = bins.groupBy("feature")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"),
        count(lit(1)).as("n_bins"))
    val withRatio = bins.join(broadcast(tot), Seq("feature"))
      .withColumn("p", (col("c_ref") + lit(1L)).cast("double") /
        (col("n_ref") + col("n_bins")).cast("double"))
      .withColumn("q", (col("c_cur") + lit(1L)).cast("double") /
        (col("n_cur") + col("n_bins")).cast("double"))
    // p/q as the exact BIGINT ratio (c_ref+1)·(n_cur+B) :
    // (c_cur+1)·(n_ref+B) through the PRE-SCALED product form (r15):
    // each factor auto-clamps to ≤31 bits before the product, so the
    // old ~3e9-rows/snapshot BIGINT-product cliff is gone — counts up
    // to 2⁶³ per snapshot are safe, and below 2³¹ the stages are
    // bit-identical to the raw products (hashes unchanged)
    graft.functions.IntegerLn
      .withLnRatioProd2(withRatio, "(c_ref + 1)", "(n_cur + n_bins)",
        "(c_cur + 1)", "(n_ref + n_bins)")
      // lr9 < 4.5e10 so the cast is exact; the products are single
      // IEEE ops on deterministic operands — portable by construction
      .withColumn("psi9",
        floor((col("p") - col("q")) * col("iln_lr9").cast("double")
          + lit(0.5)).cast("bigint"))
      .withColumn("kl9",
        floor(col("p") * col("iln_lr9").cast("double") + lit(0.5))
          .cast("bigint"))
      .groupBy("feature")
      .agg(max("n_bins").as("n_bins"), max("n_ref").as("n_ref"),
        max("n_cur").as("n_cur"),
        (expr("greatest(sum(psi9), 0L) div 1000").cast("double") /
          lit(1e6)).as("psi"),
        (expr("greatest(sum(kl9), 0L) div 1000").cast("double") /
          lit(1e6)).as("kl"),
        max(abs(col("p") - col("q"))).as("max_abs_diff"))
      .orderBy("feature")
  }

  /** Two tagged bin frames → (feature, bin, c_ref, c_cur) — the
    * shared front half of every two-snapshot drift.
    */
  private def twoSnapshotBins(refBins: DataFrame,
      curBins: DataFrame): DataFrame =
    refBins.withColumn("is_cur", lit(0L))
      .unionAll(curBins.withColumn("is_cur", lit(1L)))
      .groupBy("feature", "bin")
      .agg(sum(when(col("is_cur") === 0L, 1L).otherwise(0L)).as("c_ref"),
        sum(col("is_cur")).as("c_cur"))

  /** (feature, bin) rows for the EVENT-stream marginals: type mix,
    * hour-of-day profile, and the 10-unit value bucket — the "did
    * this week's traffic shift?" monitoring axes. `floor(value/10)`
    * is a single IEEE chain on the stored double, identical in any
    * engine; hour() is exact calendar arithmetic on the µs timestamp.
    */
  def eventBins(events: DataFrame): DataFrame =
    events.select(explode(array(
      struct(lit("event_type").as("feature"),
        col("event_type").as("bin")),
      struct(lit("hour_of_day").as("feature"),
        expr("cast(hour(ts) as string)").as("bin")),
      struct(lit("value_bucket").as("feature"),
        expr("cast(cast(floor(value / 10.0) as bigint) as string)")
          .as("bin")))).as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bin").as("bin"))

  /** PSI/KL drift between two event-stream snapshots — the same
    * smoothing/grid tail as [[driftReport]] over the event marginals.
    */
  def eventsDrift(ref: DataFrame, cur: DataFrame): DataFrame =
    driftFromBins(twoSnapshotBins(eventBins(ref), eventBins(cur)))

  /** Driver-entry split with REAL traffic drift: ref = even
    * event_ids; cur = odd event_ids minus half their error events (an
    * incident resolving — the type mix, hourly profile and value
    * histogram all move).
    */
  def eventsDriftEntry(events: DataFrame): DataFrame =
    eventsDrift(
      events.filter(pmod(col("event_id"), lit(2L)) === 0),
      events.filter(pmod(col("event_id"), lit(2L)) === 1 &&
        !(col("event_type") === "error" &&
          pmod(col("event_id"), lit(4L)) === 1)))

  /** The DuckDB mirror of [[driftFromBins]] — ONE copy of the SQL
    * smoothing/grid tail shared by every drift oracle; callers supply
    * the `(feature, bin, is_cur)` branch union. ln(p/q) comes from the
    * SAME fixed-point integer kernel as the Scala side
    * ([[graft.functions.IntegerLn.sqlCtes]], DuckDB dialect — only
    * `//` vs `div` differs textually), so the scored values are
    * bit-identical by construction, libm-free. Counts are CAST to
    * BIGINT up front (DuckDB SUM over INTEGER yields HUGEINT).
    */
  private def driftTailSql(fbBody: String): String = {
    val (lnCtes, lastCte) = graft.functions.IntegerLn.sqlCtesProd2(
      "t", "(c_ref + 1)", "(n_cur + n_bins)",
      "(c_cur + 1)", "(n_ref + n_bins)")
    s"""WITH fb AS (
       |  $fbBody),
       |bins AS (
       |  SELECT feature, bin,
       |    CAST(SUM(CASE WHEN is_cur = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c_ref,
       |    CAST(SUM(is_cur) AS BIGINT) AS c_cur
       |  FROM fb GROUP BY 1, 2),
       |tot AS (
       |  SELECT feature, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
       |    CAST(SUM(c_cur) AS BIGINT) AS n_cur,
       |    COUNT(*) AS n_bins
       |  FROM bins GROUP BY 1),
       |t AS (
       |  SELECT b.feature, t.n_bins, t.n_ref, t.n_cur,
       |    b.c_ref, b.c_cur,
       |    CAST(b.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + t.n_bins AS DOUBLE)
       |      AS p,
       |    CAST(b.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + t.n_bins AS DOUBLE)
       |      AS q
       |  FROM bins b JOIN tot t USING (feature))$lnCtes,
       |g AS (
       |  SELECT feature, n_bins, n_ref, n_cur,
       |    CAST(floor((p - q) * CAST(iln_lr9 AS DOUBLE)
       |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS psi9,
       |    CAST(floor(p * CAST(iln_lr9 AS DOUBLE)
       |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS kl9,
       |    abs(p - q) AS ad
       |  FROM $lastCte)
       |SELECT feature, MAX(n_bins) AS n_bins, MAX(n_ref) AS n_ref,
       |  MAX(n_cur) AS n_cur,
       |  CAST(greatest(CAST(SUM(psi9) AS BIGINT), 0) // 1000 AS DOUBLE)
       |    / 1e6 AS psi,
       |  CAST(greatest(CAST(SUM(kl9) AS BIGINT), 0) // 1000 AS DOUBLE)
       |    / 1e6 AS kl,
       |  MAX(ad) AS max_abs_diff
       |FROM g GROUP BY feature ORDER BY feature""".stripMargin
  }

  /** `(feature, bin, is_cur)` branch pairs over one table — the fb
    * body every two-snapshot drift oracle feeds [[driftTailSql]].
    */
  private def snapshotBranchesSql(table: String,
      features: Seq[(String, String)], refWhere: String,
      curWhere: String): String =
    features.flatMap { case (feature, bin) => Seq(
      s"SELECT '$feature' AS feature, $bin AS bin, 0 AS is_cur " +
        s"FROM $table WHERE $refWhere",
      s"SELECT '$feature', $bin, 1 FROM $table WHERE $curWhere")
    }.mkString("\n  UNION ALL\n  ")

  /** The SQL forms of [[eventBins]]' three marginals — shared by the
    * two-snapshot oracle and the store-round-trip oracle.
    */
  private val eventFeaturesSql: Seq[(String, String)] = Seq(
    "event_type" -> "event_type",
    "hour_of_day" -> "CAST(hour(ts) AS VARCHAR)",
    "value_bucket" ->
      ("CAST(CAST(floor(value / CAST(10.0 AS DOUBLE)) AS BIGINT) " +
        "AS VARCHAR)"))

  def eventsDriftSqlOver(refWhere: String, curWhere: String): String =
    driftTailSql(snapshotBranchesSql("events", eventFeaturesSql,
      refWhere, curWhere))

  val eventsDriftSql: String = eventsDriftSqlOver(
    "event_id % 2 = 0",
    "event_id % 2 = 1 AND NOT (event_type = 'error' AND event_id % 4 = 1)")

  /** (feature, bin) rows for the EMBEDDING-space marginals — the
    * monitoring axes for a vector corpus where per-dimension
    * histograms are too wide to eyeball: the cluster-label mix, the
    * dominant direction (argmax dimension — both engines return the
    * FIRST index of the max element, and the compared values are the
    * same stored floats, so ties break identically), and the squared-
    * L2-norm bucket. The norm is an arbitrary-float reduction, so it
    * rides the per-element BIGINT grid (house rule): each x² is ONE
    * IEEE double chain on the losslessly-widened float — identical in
    * any engine — snapped to the 1e9 grid and summed as longs
    * (order-free, exact), then bucketed by integer division (0.1
    * steps of norm²).
    */
  def embBins(emb: DataFrame): DataFrame =
    emb.select(explode(array(
      struct(lit("label").as("feature"),
        col("label").cast("string").as("bin")),
      struct(lit("argmax_dim").as("feature"),
        expr("cast(array_position(embedding, array_max(embedding)) " +
          "as string)").as("bin")),
      struct(lit("norm_bucket").as("feature"),
        expr("cast(aggregate(transform(embedding, x -> " +
          "cast(floor(cast(x as double) * cast(x as double) * 1e9 " +
          "+ 0.5d) as bigint)), cast(0 as bigint), (a, x) -> a + x) " +
          "div 100000000 as string)").as("bin")))).as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bin").as("bin"))

  /** PSI/KL drift between two embedding snapshots — the same
    * smoothing/grid tail as [[driftReport]] over the vector marginals.
    */
  def embeddingDrift(ref: DataFrame, cur: DataFrame): DataFrame =
    driftFromBins(twoSnapshotBins(embBins(ref), embBins(cur)))

  /** Driver-entry split with REAL drift: ref = even vec_ids; cur =
    * odd vec_ids minus cluster 3 (a mode collapsing out of the stream
    * — the label mix and dominant-direction marginals both move).
    */
  def embeddingDriftEntry(emb: DataFrame): DataFrame =
    embeddingDrift(
      emb.filter(pmod(col("vec_id"), lit(2L)) === 0),
      emb.filter(pmod(col("vec_id"), lit(2L)) === 1 &&
        col("label") =!= 3))

  /** The SQL forms of [[embBins]]' three vector marginals — shared by
    * the scored oracle and the per-bin diagnostic.
    */
  private val embFeaturesSql: Seq[(String, String)] = Seq(
    "label" -> "CAST(label AS VARCHAR)",
    "argmax_dim" ->
      "CAST(list_indexof(embedding, list_max(embedding)) AS VARCHAR)",
    "norm_bucket" ->
      ("CAST(CAST(list_sum(list_transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e9 " +
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT))) AS BIGINT) " +
        "// 100000000 AS VARCHAR)"))

  val embeddingDriftSql: String = driftTailSql(snapshotBranchesSql(
    "embeddings", embFeaturesSql,
    "vec_id % 2 = 0",
    "vec_id % 2 = 1 AND label <> 3"))

  /** Embeddings twin of [[driftBinsEntry]] — pins the vector BINNING
    * expressions (argmax tie-discipline, the norm's per-element
    * BIGINT grid) as exact cross-engine facts, independent of the
    * scoring tail.
    */
  def embeddingDriftBinsEntry(emb: DataFrame): DataFrame =
    twoSnapshotBins(
      embBins(emb.filter(pmod(col("vec_id"), lit(2L)) === 0)),
      embBins(emb.filter(pmod(col("vec_id"), lit(2L)) === 1 &&
        col("label") =!= 3)))
      .orderBy("feature", "bin")

  val embeddingDriftBinsSql: String = binsSqlOver("embeddings",
    embFeaturesSql, "vec_id % 2 = 0",
    "vec_id % 2 = 1 AND label <> 3")

  /** The documents fixture's planted incident — ONE definition of the
    * ref/cur split shared by every view of it (the PSI report here,
    * the heavy-hitter churn in [[TextAnalysis]]): ref = even doc_ids;
    * cur = odd doc_ids minus half their English docs (a language-mix
    * shift that also moves the source, length and term marginals).
    * Column and SQL forms are the same predicate by inspection; a
    * change here moves all views together.
    */
  val plantedShiftRefCol: Column = pmod(col("doc_id"), lit(2L)) === 0
  val plantedShiftCurCol: Column =
    pmod(col("doc_id"), lit(2L)) === 1 &&
      !(col("lang") === "en" && pmod(col("doc_id"), lit(4L)) === 1)
  val plantedShiftRefSql: String = "doc_id % 2 = 0"
  val plantedShiftCurSql: String =
    "doc_id % 2 = 1 AND NOT (lang = 'en' AND doc_id % 4 = 1)"

  /** Driver-entry fixture split with REAL drift (the planted shift
    * above).
    */
  def driftEntry(docs: DataFrame): DataFrame =
    driftReport(docs.filter(plantedShiftRefCol),
      docs.filter(plantedShiftCurCol))

  /** DuckDB mirror — the same add-1 smoothing, integer-ln kernel,
    * 1e9 grid, and unrounded `max_abs_diff` as the Scala tail. Ref
    * and cur are scanned as separate branches, so the mirror is
    * correct even when the two snapshots OVERLAP (ref = whole corpus,
    * cur = a probe subset — the store-fed monitoring shape).
    */
  /** The SQL forms of [[featureBins]]' three document marginals —
    * shared by the scored oracles and the per-bin diagnostic.
    */
  private val docFeaturesSql: Seq[(String, String)] = Seq(
    "lang" -> "lang",
    "len_bucket" -> "CAST(n_chars // 64 AS VARCHAR)",
    "source" -> "source")

  def driftSqlOver(refWhere: String, curWhere: String): String =
    driftTailSql(snapshotBranchesSql("documents", docFeaturesSql,
      refWhere, curWhere))

  val driftSql: String =
    driftSqlOver(plantedShiftRefSql, plantedShiftCurSql)

  /** The PRE-SCORING per-bin counts frame over the planted shift —
    * the drift family's self-localizing diagnostic. Every column is a
    * string or an exact BIGINT (no `ln`, no doubles anywhere), so it
    * hashes identically in any engine: if a scored drift entry ever
    * goes red while this stays green, the divergence is provably in
    * the `ln` scoring tail, not the data or the binning.
    */
  def driftBinsEntry(docs: DataFrame): DataFrame =
    twoSnapshotBins(featureBins(docs.filter(plantedShiftRefCol)),
      featureBins(docs.filter(plantedShiftCurCol)))
      .orderBy("feature", "bin")

  /** The SQL twin of the per-bin diagnostic frame — the
    * [[driftTailSql]] front half emitted raw (counts CAST to BIGINT:
    * DuckDB's SUM over INTEGER returns HUGEINT).
    */
  private def binsSqlOver(table: String,
      features: Seq[(String, String)], refWhere: String,
      curWhere: String): String =
    s"""WITH fb AS (
       |  ${snapshotBranchesSql(table, features, refWhere, curWhere)})
       |SELECT feature, bin,
       |  CAST(SUM(CASE WHEN is_cur = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS c_ref,
       |  CAST(SUM(is_cur) AS BIGINT) AS c_cur
       |FROM fb GROUP BY 1, 2 ORDER BY feature, bin""".stripMargin

  val driftBinsSql: String = binsSqlOver("documents", docFeaturesSql,
    plantedShiftRefSql, plantedShiftCurSql)

  /** Events twin of [[driftBinsEntry]] — additionally pins the event
    * BINNING expressions themselves (`hour(ts)`, the value bucket's
    * single IEEE chain) as exact cross-engine facts, independent of
    * the scoring tail.
    */
  def eventsDriftBinsEntry(events: DataFrame): DataFrame =
    twoSnapshotBins(
      eventBins(events.filter(pmod(col("event_id"), lit(2L)) === 0)),
      eventBins(events.filter(pmod(col("event_id"), lit(2L)) === 1 &&
        !(col("event_type") === "error" &&
          pmod(col("event_id"), lit(4L)) === 1))))
      .orderBy("feature", "bin")

  val eventsDriftBinsSql: String = binsSqlOver("events",
    eventFeaturesSql, "event_id % 2 = 0",
    "event_id % 2 = 1 AND NOT (event_type = 'error' AND event_id % 4 = 1)")

  // --- profile store ---------------------------------------------------
  // The persisted reference profile: the (feature, bin, c_ref) counts
  // frame, maintained additively across ingest batches so the drift
  // monitor never re-reads the reference corpus. Store-family
  // contract per docs/STORES.md.

  def isCompleteProfileStore(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean = {
    StoreSwap.recover(fs, new org.apache.hadoop.fs.Path(path),
      p => fs.exists(new org.apache.hadoop.fs.Path(p, "bins/_SUCCESS")))
    fs.exists(new org.apache.hadoop.fs.Path(path + "/bins/_SUCCESS"))
  }

  /** The store machinery below is marginal-agnostic: every function
    * takes the (feature, bin) projection as `binsOf` (documents →
    * [[featureBins]], the default; events → [[eventBins]]), so ONE
    * write/ensure/append/watermark/monitor implementation serves
    * every snapshot kind.
    */
  private def refBinCounts(ref: DataFrame,
      binsOf: DataFrame => DataFrame): DataFrame =
    binsOf(ref).groupBy("feature", "bin")
      .agg(count(lit(1)).as("c_ref"))

  private def publish(frame: DataFrame, path: String,
      lastBatch: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      frame.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".inprogress")
    fs.delete(tmp, true)
    frame.coalesce(1).write.parquet(tmp.toString + "/bins")
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "last_batch"))
    out.write(lastBatch.toString.getBytes("UTF-8")); out.close()
    StoreSwap.swapIn(fs, tmp, dst)
  }

  /** Atomic build of the reference profile (one corpus pass). */
  def writeProfileStore(ref: DataFrame, path: String,
      binsOf: DataFrame => DataFrame = featureBins): Unit =
    publish(refBinCounts(ref, binsOf), path, -1L)

  /** Build-once, content-fingerprinted path ([[Sketches]] ensure
    * discipline; EAGER by documented design — the fingerprint agg and
    * possible build run at construction).
    */
  def ensureProfileStore(ref: DataFrame, tag: String): String = {
    val fp = StoreSwap.contentFp(ref, "ensureProfileStore",
      "doc_id", Seq("doc_id", "source", "lang", "n_chars"))
    val path = s"/tmp/graft_profilestore_${tag}_${fp.tag}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      ref.sparkSession.sparkContext.hadoopConfiguration)
    if (!isCompleteProfileStore(fs, path)) writeProfileStore(ref, path)
    path
  }

  private def mergedBins(path: String, batch: DataFrame,
      binsOf: DataFrame => DataFrame): DataFrame = {
    val spark = batch.sparkSession
    val stored = spark.read.parquet(s"$path/bins")
      .select(col("feature"), col("bin"), col("c_ref").as("c_old"))
    refBinCounts(batch, binsOf)
      .select(col("feature"), col("bin"), col("c_ref").as("c_new"))
      .join(stored.hint("shuffle_hash"), Seq("feature", "bin"),
        "full_outer")
      .select(col("feature"), col("bin"),
        (coalesce(col("c_old"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c_ref"))
  }

  /** Fold an ingest batch into the reference profile: counts are
    * additive integers, so append ≡ fresh EXACTLY (spec law). Batch
    * cost = the batch's own agg + a dictionary-sized republish.
    */
  def appendToProfileStore(path: String, batch: DataFrame,
      binsOf: DataFrame => DataFrame = featureBins): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    require(isCompleteProfileStore(fs, path),
      s"appendToProfileStore: $path is missing or incomplete")
    publish(mergedBins(path, batch, binsOf), path,
      Sketches.lastAppliedBatch(fs, path))
  }

  /** Streaming-replay-safe fold — additive counts double-count under
    * blind re-append, so the applied-batch watermark rides the atomic
    * publish ([[Sketches.appendBatchToSketchStore]] discipline).
    * Returns whether the batch was applied.
    */
  def appendBatchToProfileStore(path: String, batch: DataFrame,
      batchId: Long,
      binsOf: DataFrame => DataFrame = featureBins): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    require(isCompleteProfileStore(fs, path),
      s"appendBatchToProfileStore: $path is missing or incomplete")
    if (batchId <= Sketches.lastAppliedBatch(fs, path)) false
    else { publish(mergedBins(path, batch, binsOf), path, batchId); true }
  }

  /** Drift of a current snapshot against the STORED reference profile
    * — the reference corpus is never re-read. Same math (and the same
    * oracle SQL) as [[driftReport]].
    */
  def driftFromStore(spark: SparkSession, path: String,
      cur: DataFrame,
      binsOf: DataFrame => DataFrame = featureBins): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    require(isCompleteProfileStore(fs, path),
      s"driftFromStore: $path is missing or incomplete")
    val stored = spark.read.parquet(s"$path/bins")
    val curBins = binsOf(cur).groupBy("feature", "bin")
      .agg(count(lit(1)).as("c_cur"))
    driftFromBins(stored.join(curBins.hint("shuffle_hash"),
        Seq("feature", "bin"), "full_outer")
      .select(col("feature"), col("bin"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur")))
  }

  /** The profile store's streaming watermark — the ONE accessor
    * consumers ([[graft.streaming.EventStream.driftMonitorStream]])
    * go through, so the watermark's on-disk location stays an
    * implementation detail of [[publish]].
    */
  def lastAppliedProfileBatch(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Long =
    Sketches.lastAppliedBatch(fs, path)

  /** Driver-entry split for the store round-trip: ref = doc_id ≡ 0
    * (mod 3) builds the store, cur = the rest probes it. The oracle
    * recomputes the same drift from the raw table, so a hash match
    * proves the store holds exactly the reference's counts.
    */
  def driftStoreEntry(docs: DataFrame, tag: String): DataFrame = {
    val ref = docs.filter(pmod(col("doc_id"), lit(3L)) === 0)
    val cur = docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0)
    val path = ensureProfileStore(ref, tag)
    driftFromStore(docs.sparkSession, path, cur)
  }

  val driftStoreSql: String =
    driftSqlOver("doc_id % 3 = 0", "doc_id % 3 <> 0")

  /** Build-once EVENT-stream reference profile — the traffic-baseline
    * artifact the events drift monitor probes/absorbs. Same store
    * machinery ([[writeProfileStore]] with [[eventBins]]); the
    * fingerprint folds the event content columns so regenerated
    * fixtures rebuild by PATH. EAGER by documented design.
    */
  def ensureEventProfileStore(events: DataFrame, tag: String): String = {
    // ts rides the fingerprint because the stored eventBins marginals
    // include hour(ts): a regenerated fixture with identical
    // ids/types/values but shifted timestamps must rebuild, not reuse
    // a stale hour-of-day baseline (r10 same-shape-regeneration rule)
    val fp = StoreSwap.contentFp(events, "ensureEventProfileStore",
      "event_id", Seq("event_id", "event_type", "value", "ts"))
    val path = s"/tmp/graft_evprofile_${tag}_${fp.tag}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      events.sparkSession.sparkContext.hadoopConfiguration)
    if (!isCompleteProfileStore(fs, path))
      writeProfileStore(events, path, eventBins)
    path
  }

  /** Driver-entry store round-trip for the EVENTS profile: ref =
    * event_id ≡ 0 (mod 3) builds the store, cur = the rest probes it;
    * the oracle recomputes the drift from the raw events table, so a
    * hash match proves the store holds exactly the traffic baseline.
    */
  def eventsDriftStoreEntry(events: DataFrame, tag: String): DataFrame = {
    val ref = events.filter(pmod(col("event_id"), lit(3L)) === 0)
    val cur = events.filter(pmod(col("event_id"), lit(3L)) =!= 0)
    val path = ensureEventProfileStore(ref, tag)
    driftFromStore(events.sparkSession, path, cur, eventBins)
  }

  val eventsDriftStoreSql: String =
    eventsDriftSqlOver("event_id % 3 = 0", "event_id % 3 <> 0")
}
