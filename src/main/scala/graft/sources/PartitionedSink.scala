package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink-side parity and the 100 TB layout story (SURVEY S5 — the
  * reference's only sink is gather-to-client; a Spark engine adds
  * durable writes):
  *
  *  - [[writePartitioned]]: hive-style `partitionBy` layout — readers
  *    filtering on the partition column scan only matching directories
  *    (partition pruning: `PartitionFilters` in the plan, zero I/O for
  *    pruned partitions);
  *  - [[writeSorted]]: `repartitionByRange` + `sortWithinPartitions`
  *    (the materialization of dask's `set_index`, SURVEY O4) — parquet
  *    row-group min/max stats then skip non-matching ranges on read.
  */
object PartitionedSink {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def writeSorted(df: DataFrame, path: String, sortCol: String,
      numPartitions: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numPartitions, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
