package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.TableLoader

/** Query context: a session + a scale-factor directory of fixture tables.
  * Mirrors the reference's `tables` dict handed to every query
  * (`/root/reference/benchmark/tpch/queries.py:848-863` `by_number`,
  * built by `test_tpch.py:104-117 load_tables`).
  */
final case class Ctx(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = TableLoader.table(spark, dir, name)

  def lineitem: DataFrame = t("lineitem")
  def orders: DataFrame = t("orders")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def nation: DataFrame = t("nation")
  def region: DataFrame = t("region")
  /** events.ts is TIMESTAMP(NANOS) parquet; with
    * `spark.sql.legacy.parquet.nanosAsLong` it reads as long nanos —
    * normalize to a microsecond timestamp (floor, matching DuckDB's
    * ns→µs truncation).
    */
  def events: DataFrame = {
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
