package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** Training-data-pipeline extension queries (builder brief): dedup,
  * similarity search, text analysis, time windows, set ops, multimodal
  * plumbing. Each SQL-expressible operator carries a DuckDB oracle;
  * hash-based ops (minhash/simhash/ANN — engine-specific hash
  * functions) and the multimodal stub are declared without oracles →
  * the driver records a rows-only check, and ScalaTest covers their
  * semantics.
  */
object Extensions {

  /** Set operation (SURVEY §2.8 — free in Spark, declared in our
    * surface): customers ∪ suppliers per nation.
    */
  def unionKinds(c: Ctx): DataFrame =
    c.customer.select(lit("customer").as("kind"),
        col("c_nationkey").as("nationkey"))
      .unionAll(c.supplier.select(lit("supplier").as("kind"),
        col("s_nationkey").as("nationkey")))
      .groupBy("kind", "nationkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("kind", "nationkey")

  val unionKindsSql: String =
    """SELECT kind, nationkey, COUNT(*) AS n FROM (
      |  SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
      |  UNION ALL
      |  SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier) t
      |GROUP BY kind, nationkey ORDER BY kind, nationkey""".stripMargin

  val queries: Map[String, Ctx => DataFrame] = Map(
    // dedup family
    "dedup_exact" -> (c => Dedup.exact(c.documents)),
    "dedup_fingerprint" -> (c => Dedup.fingerprint(c.documents)),
    "dedup_jaccard_hist" -> (c => Dedup.jaccardHistogram(c.documents)),
    "dedup_minhash_lsh" -> (c => Dedup.minHashLsh(c.documents)),
    "dedup_simhash_pairs" -> (c => Dedup.simHashPairs(c.documents)),
    // similarity search
    "sim_cosine_topk" -> (c => Similarity.cosineTopK(c.embeddings)),
    "sim_ann_lsh" -> (c => Similarity.annLshTopK(c.embeddings)),
    "sim_label_centroids" -> (c => Similarity.labelCentroids(c.embeddings)),
    // text analysis
    "text_stats" -> (c => TextAnalysis.stats(c.documents)),
    "text_token_count" -> (c => TextAnalysis.tokenCounts(c.documents)),
    "text_quality" -> (c => TextAnalysis.quality(c.documents)),
    "text_lang_id" -> (c => TextAnalysis.langId(c.documents)),
    // time windows / events
    "events_tumbling" -> (c => EventOps.tumblingHourly(c.events)),
    "events_sessionize" -> (c => EventOps.sessionize(c.events)),
    "events_json" -> (c => EventOps.jsonExtract(c.events)),
    "events_top_days" -> (c => EventOps.topDays(c.events)),
    // set ops
    "set_union_kinds" -> (unionKinds _),
    // multimodal plumbing (stubbed decode, real Dataset pipeline)
    "multimodal_features" ->
      (c => Multimodal.featuresQuery(c.spark, c.documents)))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> Dedup.exactSql,
    "dedup_fingerprint" -> Dedup.fingerprintSql,
    "dedup_jaccard_hist" -> Dedup.jaccardHistogramSql,
    "sim_cosine_topk" -> Similarity.cosineTopKSql(),
    "text_stats" -> TextAnalysis.statsSql,
    "text_token_count" -> TextAnalysis.tokenCountsSql,
    "text_quality" -> TextAnalysis.qualitySql,
    "text_lang_id" -> TextAnalysis.langIdSql,
    "events_tumbling" -> EventOps.tumblingHourlySql,
    "events_sessionize" -> EventOps.sessionizeSql(),
    "events_json" -> EventOps.jsonExtractSql,
    "events_top_days" -> EventOps.topDaysSql(),
    "set_union_kinds" -> unionKindsSql)
}
