package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join building block for the
  * 100 TB posture. Writing both sides of a hot join bucketed (and
  * sorted) by the join key lets Spark plan a sort-merge join with NO
  * shuffle exchange on either side: the bucketing IS the exchange,
  * paid once at write time and amortized over every subsequent join —
  * the same economics as dask's persisted `set_index`
  * (`/root/reference/benchmark/tpch/queries.py:175,177` pre-partitions
  * join inputs; SURVEY O4/J5).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table at
    * `warehouse/tableName`.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", s"$p/$tableName"))
      .saveAsTable(tableName)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket counts match (verify: executed plan has no Exchange above
    * the scans).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
