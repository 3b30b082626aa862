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
  /** events.ts normalized to a session-UTC microsecond TIMESTAMP,
    * whatever the fixture generation wrote:
    *  - TIMESTAMP(NANOS) parquet (pre-r8 fixtures) reads as long nanos
    *    under `spark.sql.legacy.parquet.nanosAsLong` — floor-convert
    *    to µs (matching DuckDB's ns→µs truncation);
    *  - timestamp[us] without tz metadata (r8+ fixtures) reads as
    *    TIMESTAMP_NTZ — cast to TIMESTAMP, value-preserving because
    *    the session timezone is pinned UTC ([[graft.Engine]]), and
    *    required because `unix_micros`/window helpers take TIMESTAMP;
    *  - a plain TIMESTAMP passes through.
    */
  def events: DataFrame = {
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
