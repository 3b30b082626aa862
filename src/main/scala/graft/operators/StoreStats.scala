package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operational inspection of any persisted store root — the numbers an
  * ingest loop logs (and alerts on) per artifact: completeness, batch
  * and applied-ledger counts (read amplification / replay history),
  * byte and file footprint (compaction pressure), and leftover
  * `.old` / `.inprogress` / temp directories (crash evidence; `.old`
  * alongside a complete root means the last publish's final sweep
  * didn't run — harmless, swept by the next publish; `.old` alongside
  * an INCOMPLETE root is the recovery case [[StoreSwap.recover]]
  * heals). Pure FileSystem metadata — no Spark job, no data read, so
  * it is safe to call at any cadence against stores of any size.
  */
object StoreStats {

  /** One row per inspected root:
    * `(store, complete, recoverable, batches, applied, data_files,
    * bytes, has_old, has_inprogress, temp_dirs)`. Strictly
    * NON-mutating — unlike [[Dedup.isCompleteSignatureStore]] this
    * does not auto-recover a crashed generation, it REPORTS it
    * (`recoverable = true` = incomplete root with a complete `.old`
    * — the state the self-healing gate or the next publish fixes).
    */
  def inspect(spark: SparkSession, paths: Map[String, String]): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val rows = paths.toSeq.sortBy(_._1).map { case (name, p) =>
      val root = new org.apache.hadoop.fs.Path(p)
      val exists = fs.exists(root)
      def count(pred: org.apache.hadoop.fs.FileStatus => Boolean): Int =
        if (!exists) 0 else fs.listStatus(root).count(pred)
      // recursive batch-dir census: `batch=` dirs can sit at the root
      // (cluster map) or one level down (containment store frames)
      def batchDirs(dir: org.apache.hadoop.fs.Path, depth: Int): Int =
        if (!fs.exists(dir) || depth > 1) 0
        else fs.listStatus(dir).filter(_.isDirectory).map { s =>
          val n = s.getPath.getName
          (if (n.startsWith("batch=")) 1 else 0) +
            (if (n.startsWith("batch=") || n.startsWith("_") ||
              n.startsWith(".")) 0
            else batchDirs(s.getPath, depth + 1))
        }.sum
      val applied = {
        val a = new org.apache.hadoop.fs.Path(root, "_applied")
        if (fs.exists(a)) fs.listStatus(a).length else 0
      }
      val (bytes, files) =
        if (!exists) (0L, 0L)
        else {
          val cs = fs.getContentSummary(root)
          (cs.getLength, cs.getFileCount)
        }
      // completeness = the family's own gate marker: root `_SUCCESS`
      // (signature/containment stores, cluster map, loop root) or the
      // well-known frame-level markers of the subdir-publishing
      // families (profile `bins/`, sketch stores `sketches/`, index
      // `meta/stats/`, export `_manifest/`)
      val gateDirs = Seq("", "/bins", "/sketches", "/meta/stats",
        "/_manifest")
      def ok(q: String): Boolean = gateDirs.exists(g =>
        fs.exists(new org.apache.hadoop.fs.Path(q + g + "/_SUCCESS")))
      (name,
        ok(p),
        !ok(p) && ok(p + ".old"),
        batchDirs(root, 0),
        applied,
        files,
        bytes,
        fs.exists(new org.apache.hadoop.fs.Path(p + ".old")),
        fs.exists(new org.apache.hadoop.fs.Path(p + ".inprogress")),
        count(s => s.isDirectory &&
          (s.getPath.getName.startsWith(".batchtmp_") ||
            s.getPath.getName.startsWith(".appendtmp_"))))
    }
    import spark.implicits._
    rows.toDF("store", "complete", "recoverable", "batches", "applied",
      "data_files", "bytes", "has_old", "has_inprogress", "temp_dirs")
  }
}
