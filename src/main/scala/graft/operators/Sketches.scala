package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Persisted HLL sketch store — incremental per-source distinct-token
  * cardinality, the sketch-family member of the store discipline
  * (signature / cluster-map / semantic / LM stores): per-source
  * DataSketches HLL sketches are written ONCE, a new batch MERGES its
  * own sketches in (`hll_union` — sketches are the mergeable summary,
  * so per-append cost is the batch's aggregation plus a
  * dictionary-sized republish of ≤|sources| rows), and cardinality
  * estimates come from the stored binaries without ever re-reading
  * the base corpus. This is THE production pattern for "distinct
  * tokens / urls / users per source, maintained across daily ingests"
  * at 100 TB: the corpus-sized work is one map-side-combined
  * `hll_sketch_agg` pass per batch; everything else is KB-sized.
  *
  * Engine-specific binaries → the driver entry is rows-only by
  * declared design; `SketchesSpec` carries the laws instead:
  * append ≡ fresh over the union (estimates bit-equal — HLL union at
  * matched lgK is lossless in HLL mode), and estimates within HLL
  * error of exact `countDistinct`.
  *
  * Atomic publish: temp + rename, `_SUCCESS` completeness gate — the
  * [[QualitySignals.writeLmStore]] conventions (append republishes
  * because sketches, like renormalized log-probs, are a
  * dictionary-sized artifact; read-before-replace is safe because the
  * merged frame is fully materialized by the temp write before the
  * destination is swapped).
  */
object Sketches {

  /** lgK = 14 → ~1.6 KB per sketch, standard error ≈ 0.81% — fine for
    * the per-source scale decisions these estimates feed.
    */
  val LgK: Int = 14

  /** Per-source (HLL sketch of distinct tokens, exact token count) —
    * one corpus pass, map-side partial sketches.
    */
  def sourceTokenSketches(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("source")
      .agg(expr(s"hll_sketch_agg(w, $LgK)").as("sk"),
        count(lit(1)).as("n_tokens"))

  private def publish(frame: DataFrame, path: String,
      lastBatch: Long = -1L): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      frame.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".inprogress")
    fs.delete(tmp, true)
    frame.coalesce(1).write.parquet(tmp.toString + "/sketches")
    // the streaming-replay watermark rides inside the same atomic
    // swap, so store content and applied-batch stamp can never diverge
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "last_batch"))
    out.write(lastBatch.toString.getBytes("UTF-8")); out.close()
    StoreSwap.swapIn(fs, tmp, dst)
  }

  /** Highest streaming batch id already folded in (−1 for a store
    * never touched by a stream — incl. stores written before this
    * field existed).
    */
  def lastAppliedBatch(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path, "last_batch")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  def writeSketchStore(docs: DataFrame, path: String): Unit =
    publish(sourceTokenSketches(docs), path)

  def isCompleteSketchStore(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(path + "/sketches/_SUCCESS"))

  /** Fold a batch into the store: the batch aggregates to its own
    * per-source sketches (the only corpus-sized work), which
    * full-outer-merge with the stored rows via `hll_union` — absent
    * sides pass through unchanged. Dictionary-sized republish.
    */
  def appendToSketchStore(path: String, batch: DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    appendMerged(path, batch, lastAppliedBatch(fs, path))
  }

  /** Streaming-replay-safe fold: `foreachBatch` re-delivers a batch
    * after a failure, and a blind append would double-count its
    * tokens (`n_tokens` is additive; the HLL side alone would forgive
    * the replay). The applied-batch watermark rides the atomic
    * publish, so a replayed id is skipped exactly. Returns whether
    * the batch was applied.
    */
  def appendBatchToSketchStore(path: String, batch: DataFrame,
      batchId: Long): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (batchId <= lastAppliedBatch(fs, path)) false
    else { appendMerged(path, batch, batchId); true }
  }

  private def appendMerged(path: String, batch: DataFrame,
      stamp: Long): Unit = {
    val spark = batch.sparkSession
    val stored = spark.read.parquet(s"$path/sketches")
      .select(col("source"), col("sk").as("sk_old"),
        col("n_tokens").as("n_old"))
    val fresh = sourceTokenSketches(batch)
      .select(col("source"), col("sk").as("sk_new"),
        col("n_tokens").as("n_new"))
    val merged = stored.join(fresh.hint("shuffle_hash"), Seq("source"),
        "full_outer")
      .select(col("source"),
        when(col("sk_old").isNull, col("sk_new"))
          .when(col("sk_new").isNull, col("sk_old"))
          .otherwise(expr("hll_union(sk_old, sk_new)")).as("sk"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
          .as("n_tokens"))
    publish(merged, path, stamp)
  }

  /** Build-once helper — content-fingerprint path keying +
    * completeness gate (the ensure* discipline; EAGER by documented
    * design).
    */
  def ensureSketchStore(docs: DataFrame, tag: String): String = {
    val fp = StoreSwap.contentFp(docs, "ensureSketchStore",
      "doc_id", Seq("doc_id", "text", "source"))
    val path = s"/tmp/graft_sketchstore_${tag}_${fp.tag}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (!isCompleteSketchStore(fs, path)) writeSketchStore(docs, path)
    path
  }

  /** Cardinality report from the STORED sketches — no corpus read. */
  def estimateStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketches")
      .select(col("source"), col("n_tokens"),
        expr("hll_sketch_estimate(sk)").cast("bigint")
          .as("est_distinct_tokens"))
      .orderBy("source")

  // --- KLL quantile store ---------------------------------------------
  // the ORDER-STATISTICS member of the store family (custom
  // TypedImperativeAggregate over the DataSketches KLL classes in
  // Spark's own jars — graft.functions.KllAggregate): per-source
  // doc-length distributions maintained across ingests, the
  // production "has this source's length profile drifted?" monitor.
  // Same publish/append/watermark discipline as the HLL store; a new
  // batch aggregates its OWN sketches (the only corpus-sized work)
  // and kll_merge_agg folds them into the stored ≤|sources| rows.

  import graft.functions.KllFunctions._

  /** Per-source (KLL sketch of n_chars, exact doc count) — one corpus
    * pass, map-side partial sketches.
    */
  def sourceLengthSketches(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(kll_sketch_agg(col("n_chars").cast("double")).as("qk"),
        count(lit(1)).as("n_docs"))

  def writeQuantileStore(docs: DataFrame, path: String): Unit =
    publish(sourceLengthSketches(docs), path)

  def isCompleteQuantileStore(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean = isCompleteSketchStore(fs, path)

  def appendToQuantileStore(path: String, batch: DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    appendQuantileMerged(path, batch, lastAppliedBatch(fs, path))
  }

  /** Streaming-replay-safe fold — same applied-batch watermark
    * semantics as [[appendBatchToSketchStore]].
    */
  def appendBatchToQuantileStore(path: String, batch: DataFrame,
      batchId: Long): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (batchId <= lastAppliedBatch(fs, path)) false
    else { appendQuantileMerged(path, batch, batchId); true }
  }

  private def appendQuantileMerged(path: String, batch: DataFrame,
      stamp: Long): Unit = {
    val spark = batch.sparkSession
    val stored = spark.read.parquet(s"$path/sketches")
      .select(col("source"), col("qk"), col("n_docs"))
    val merged = stored.unionAll(sourceLengthSketches(batch))
      .groupBy("source")
      .agg(kll_merge_agg(col("qk")).as("qk"),
        sum("n_docs").as("n_docs"))
    publish(merged, path, stamp)
  }

  def ensureQuantileStore(docs: DataFrame, tag: String): String = {
    val fp = StoreSwap.contentFp(docs, "ensureQuantileStore",
      "doc_id", Seq("doc_id", "n_chars", "source"))
    val path = s"/tmp/graft_qstore_${tag}_${fp.tag}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (!isCompleteQuantileStore(fs, path)) writeQuantileStore(docs, path)
    path
  }

  /** Length-distribution report from the STORED sketches — KB-sized
    * read, no corpus access. Exact order statistics below k=1024 per
    * source; ~1% rank error beyond.
    */
  def quantileReport(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketches")
      .select(col("source"), col("n_docs"),
        kll_quantile(col("qk"), lit(0.5)).as("p50"),
        kll_quantile(col("qk"), lit(0.9)).as("p90"),
        kll_quantile(col("qk"), lit(0.99)).as("p99"))
      .orderBy("source")
}
