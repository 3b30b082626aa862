package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Resumable training-shard export with a verifiable manifest — the
  * terminal sink of the curation pipeline ("write the final mix as N
  * shards, restartable, provably complete"), completing the sink
  * story beyond [[PartitionedSink]]'s layout primitives (reference's
  * only sink is gather-to-client — benchmark harnesses materialize
  * results client-side; a durable, auditable export is what the same
  * workload needs at 100 TB).
  *
  * Layout and guarantees:
  *
  *  - Documents land in `shards` hive dirs (`shard=K/`), shard chosen
  *    by the portable salted 60-bit md5 rule
  *    ([[Sampling.hashBucketFull]] mod shards — layout-independent,
  *    append-stable), rows inside each file in (skey, doc_id) order:
  *    a reader streaming a shard in file order replays the
  *    deterministic training order with NO window anywhere (the sort
  *    is per-task after clustering by shard).
  *  - The write proceeds in `waves` (shard mod waves), each wave ONE
  *    Spark job over the corpus: wave tmp dir → per-shard dir rename →
  *    underscore marker, all idempotent. A re-run after any crash
  *    skips completed waves, clears half-written tmp state, and
  *    rewrites only the missing waves — resumability at 100 TB means
  *    a lost cluster costs one wave, not the export.
  *  - `_manifest/` is computed from the WRITTEN FILES (read-back, not
  *    the source frame): per shard, row count, bit_xor of each doc's
  *    60-bit content hash (md5 over id:text — order-free, exact),
  *    char sum and id extremes. The driver oracle recomputes the same
  *    frame from the raw table in DuckDB — equality proves every
  *    document was written exactly once, uncorrupted, to its correct
  *    shard. `_manifest/_SUCCESS` is the completeness gate
  *    (temp+rename publish, the store-family discipline).
  *
  * Scale shape: `waves` corpus scans (bounded, chosen), one hash
  * shuffle per wave on the shard column, per-task sorts; manifest is
  * one read-back aggregation. Nothing quadratic, no windows, no
  * driver-side data.
  */
object TrainingExport {

  val ShardSalt = "exp:"

  /** Portable per-doc 60-bit content hash (id-and-text binding) —
    * DuckDB: CAST('0x'||substring(md5(...),1,15) AS BIGINT).
    */
  private def contentHash: org.apache.spark.sql.Column =
    conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
      col("text"))), 1, 15), 16, 10).cast("bigint")

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

  def isCompleteExport(f: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean =
    f.exists(new org.apache.hadoop.fs.Path(s"$path/_manifest/_SUCCESS"))

  /** Idempotent, wave-resumable export. Safe to call again after any
    * interruption; a completed export returns immediately.
    */
  def exportShards(docs: DataFrame, path: String, shards: Int = 16,
      waves: Int = 4): Unit = {
    val spark = docs.sparkSession
    val f = fs(spark)
    if (isCompleteExport(f, path)) return
    f.mkdirs(new org.apache.hadoop.fs.Path(path))
    // shard count is a property of the export — record it so append
    // and reshard never have to guess (underscore name: invisible to
    // the parquet reader)
    val shardsFile = new org.apache.hadoop.fs.Path(s"$path/_shards")
    if (!f.exists(shardsFile)) {
      val o = f.create(shardsFile)
      o.write(shards.toString.getBytes("UTF-8")); o.close()
    } else {
      // resuming: the caller's shard count must match the layout the
      // first attempt recorded — silently mixing two shard rules would
      // corrupt every wave written from here on
      val rec = exportShardCount(f, path)
      require(rec == shards,
        s"resume with shards=$shards but $path was started with $rec")
    }
    val assigned = docs
      .withColumn("skey", Sampling.hashBucketFull(ShardSalt, col("doc_id")))
      .withColumn("shard", pmod(col("skey"), lit(shards.toLong)))
    for (w <- 0 until waves) {
      // marker keyed by the WAVE COUNT: resuming with a different
      // `waves` then matches no markers and rewrites every wave —
      // each shard dir is delete+renamed exactly once under the new
      // grouping, so the mismatch self-heals instead of silently
      // publishing an export missing the unwritten shard groups
      val marker = new org.apache.hadoop.fs.Path(
        s"$path/_wave${w}of$waves.done")
      if (!f.exists(marker)) {
        val tmp = new org.apache.hadoop.fs.Path(s"$path/.wave$w.tmp")
        f.delete(tmp, true) // half-written state from a crashed attempt
        // sort leads with the partition column: the dynamic-partition
        // writer requires shard ordering and would otherwise insert
        // its own non-stable sort, destroying the training order
        assigned.filter(pmod(col("shard"), lit(waves.toLong)) === w)
          .repartition(col("shard"))
          .sortWithinPartitions("shard", "skey", "doc_id")
          .write.partitionBy("shard").parquet(tmp.toString)
        for (st <- f.listStatus(tmp)
            if st.getPath.getName.startsWith("shard=")) {
          val dst = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
          f.delete(dst, true) // crashed AFTER some renames: re-land cleanly
          require(f.rename(st.getPath, dst),
            s"rename ${st.getPath} -> $dst failed")
        }
        f.delete(tmp, true)
        f.create(marker).close()
      }
    }
    // manifest from the written files; temp+rename publish, _SUCCESS
    // inside is the completeness gate
    publishManifest(spark, path, manifestFromFiles(spark, path), -1L)
  }

  private def publishManifest(spark: SparkSession, path: String,
      frame: DataFrame, lastBatch: Long): Unit = {
    val f = fs(spark)
    val mTmp = new org.apache.hadoop.fs.Path(s"$path/.manifest.tmp")
    f.delete(mTmp, true)
    frame.coalesce(1).write.parquet(mTmp.toString)
    // the append-replay watermark rides the same atomic swap as the
    // manifest itself (the Sketches.publish discipline)
    val o = f.create(new org.apache.hadoop.fs.Path(mTmp, "_last_batch"))
    o.write(lastBatch.toString.getBytes("UTF-8")); o.close()
    val mDst = new org.apache.hadoop.fs.Path(s"$path/_manifest")
    graft.operators.StoreSwap.swapIn(f, mTmp, mDst)
  }

  def exportShardCount(f: org.apache.hadoop.fs.FileSystem,
      path: String): Int = {
    val in = f.open(new org.apache.hadoop.fs.Path(s"$path/_shards"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Highest appended batch id folded into the manifest (−1 for a
    * fresh export or one written before this field existed).
    */
  def lastAppendedBatch(f: org.apache.hadoop.fs.FileSystem,
      path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_manifest/_last_batch")
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Incremental append — the daily-ingest closure of the export
    * family: new documents land in their shards (the salted-md5 rule
    * is append-stable, so existing docs' shards never change) and the
    * manifest MERGES batch aggregates into the stored rows (xor is
    * associative, counts additive — batch-proportional cost, the
    * whole export is never re-read).
    *
    * CONTRACT: the batch must be disjoint from the export (the
    * upstream dedup gate's job — e.g. `Dedup.incrementalExactBloom`);
    * a doc_id already exported would land twice, and the manifest
    * would faithfully COUNT it twice (the audit reveals, not
    * prevents, upstream double-sends).
    *
    * Crash/replay discipline: batch files carry a `b<id>-` name
    * prefix, so a re-run first deletes any partial leftovers of the
    * SAME batch id before re-landing them (idempotent), and the
    * replay watermark rides the manifest's atomic publish — a batch
    * id at or below it is skipped exactly (a crash between file moves
    * and manifest publish re-runs the whole batch cleanly).
    * Returns whether the batch was applied.
    */
  def appendBatchToExport(path: String, batch: DataFrame,
      batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val f = fs(spark)
    require(isCompleteExport(f, path), s"$path is not a completed export")
    if (batchId <= lastAppendedBatch(f, path)) return false
    val shards = exportShardCount(f, path)
    // clean partial leftovers of a crashed attempt of THIS batch
    for (st <- f.listStatus(new org.apache.hadoop.fs.Path(path))
        if st.getPath.getName.startsWith("shard=");
        file <- f.listStatus(st.getPath)
        if file.getPath.getName.startsWith(s"b$batchId-"))
      f.delete(file.getPath, false)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.append$batchId.tmp")
    f.delete(tmp, true)
    batch
      .withColumn("skey", Sampling.hashBucketFull(ShardSalt, col("doc_id")))
      .withColumn("shard", pmod(col("skey"), lit(shards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "skey", "doc_id")
      .write.partitionBy("shard").parquet(tmp.toString)
    // batch manifest from the STAGED files (before they move)
    val batchManifest = manifestFromFiles(spark, tmp.toString)
      .collect() // ≤ shards rows
    for (st <- f.listStatus(tmp)
        if st.getPath.getName.startsWith("shard=")) {
      val dstDir = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
      f.mkdirs(dstDir)
      for (file <- f.listStatus(st.getPath)
          if file.getPath.getName.endsWith(".parquet"))
        require(f.rename(file.getPath, new org.apache.hadoop.fs.Path(
          dstDir, s"b$batchId-${file.getPath.getName}")),
          s"rename ${file.getPath} failed")
    }
    f.delete(tmp, true)
    import spark.implicits._
    val fresh = batchManifest.toSeq.map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toDF("shard", "n_rows", "xor_hash", "sum_chars", "min_doc", "max_doc")
    val merged = readManifest(spark, path).unionAll(fresh)
      .groupBy("shard")
      .agg(sum("n_rows").as("n_rows"),
        expr("bit_xor(xor_hash)").as("xor_hash"),
        sum("sum_chars").as("sum_chars"),
        min("min_doc").as("min_doc"), max("max_doc").as("max_doc"))
      .orderBy("shard")
      // the republish replaces what this plan reads — materialize first
      // (the read-before-replace convention)
      .localCheckpoint()
    publishManifest(spark, path, merged, batchId)
    true
  }

  /** Per-shard audit frame aggregated from the shard files themselves
    * (underscore/dot paths are invisible to the parquet reader, so
    * markers and tmp dirs never pollute it).
    */
  def manifestFromFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("shard").cast("bigint").as("shard"), col("doc_id"),
        col("text"), col("n_chars"))
      .withColumn("ch", contentHash)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(ch)").as("xor_hash"),
        sum("n_chars").cast("bigint").as("sum_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("shard")

  /** The published manifest (no corpus read). */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_manifest").orderBy("shard")

  /** One shard in training order — the trainer-side reader. The shard
    * predicate is a PARTITION filter (hive layout), so the scan touches
    * only that shard's directory (plan-asserted in PlanSpec); the sort
    * re-establishes the (skey, doc_id) order across the shard's files
    * (each file is internally ordered, but file enumeration order is
    * not a contract — and appended `b<id>-` files interleave). Sorting
    * ONE shard (corpus/shards rows) is the trainer-side unit of work;
    * shards are the parallel axis.
    */
  def readShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("shard") === shard)
      .orderBy("skey", "doc_id")

  /** Build-once entry helper — content-fingerprint path keying + the
    * completeness gate (the ensure* discipline; EAGER by documented
    * design: the fingerprint and any missing waves run now so
    * constructing the query map stays cheap on later calls).
    */
  def ensureExport(docs: DataFrame, tag: String, shards: Int = 16,
      waves: Int = 4): String = {
    val fp = graft.operators.StoreSwap.contentFp(docs, "ensureExport",
      "doc_id", Seq("doc_id", "text", "lang", "source", "n_chars"))
    val path = s"/tmp/graft_export_${tag}_${fp.tag}"
    exportShards(docs, path, shards, waves)
    path
  }

  /** Re-export a COMPLETED export under a different shard count — the
    * "next training run wants 4× the shards" operation, fed from the
    * export itself (the curated corpus artifact) rather than the
    * upstream pipeline. Same wave-resumable write; the shard rule is
    * a pure function of doc_id, so resharding is a deterministic
    * relabeling. Invariant (spec'd): global row count and the
    * xor-of-xors content hash are preserved exactly.
    */
  def reshard(spark: SparkSession, srcPath: String, dstPath: String,
      shards: Int, waves: Int = 4): Unit = {
    require(isCompleteExport(fs(spark), srcPath),
      s"$srcPath is not a completed export")
    exportShards(spark.read.parquet(srcPath).drop("skey", "shard"),
      dstPath, shards, waves)
  }

  /** DuckDB oracle for the manifest — same shard rule, same content
    * hash, computed from the raw table: agreement with the read-back
    * manifest proves the export wrote exactly the source.
    */
  def manifestSql(shards: Int = 16): String = {
    val key = Sampling.hashBucketFullSql(ShardSalt, "doc_id")
    s"""SELECT $key % $shards AS shard, count(*) AS n_rows,
       |  bit_xor(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
       |    || ':' || text), 1, 15) AS BIGINT)) AS xor_hash,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM documents
       |GROUP BY 1 ORDER BY shard""".stripMargin
  }
}
