package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The composed end-to-end corpus-preparation pipeline — the operators
  * of this engine chained the way a training-data run actually chains
  * them, as ONE declarative DAG Catalyst plans end to end:
  *
  *   1. dedup-cluster the corpus ([[Dedup.clusters]]) and keep each
  *      cluster's canonical document (`doc_id == cluster_id`);
  *   2. stratified deterministic sampling + train/valid/test split
  *      ([[Sampling]] buckets — layout-independent, append-stable);
  *   3. quality gate: drop documents under a minimum token count;
  *   4. report per-(lang, split) document and token counts.
  *
  * Every stage is individually oracle-checked elsewhere; this entry
  * checks the COMPOSITION bit-for-bit (one assembled DuckDB statement
  * over the same parquet). At 100 TB nothing here collects or loops on
  * the driver except the component iteration inside step 1.
  */
object CorpusPipeline {

  def corpusStats(docs: DataFrame, tau: Double = 0.5,
      minTokens: Int = 5): DataFrame = {
    val keep = Dedup.clusters(docs, tau)
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id")
    val rate = Sampling.ratePermille.foldLeft(lit(Sampling.defaultPermille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    val spl = Sampling.hashBucket("spl:", col("doc_id"))
    docs.join(keep, "doc_id")
      .filter(Sampling.hashBucket("smp:", col("doc_id")) < rate)
      .withColumn("split",
        when(spl < 800, "train").when(spl < 900, "valid").otherwise("test"))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .filter(col("n_tokens") >= minTokens)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        (sum("n_tokens").cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang", "split")
  }

  def corpusStatsSql(tau: Double = 0.5, minTokens: Int = 5): String = {
    val rateCase = Sampling.ratePermille
      .map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", s" ELSE ${Sampling.defaultPermille} END")
    s"""WITH RECURSIVE ${Dedup.clusterLblCtes(tau)},
       |keep AS (SELECT doc_id FROM lbl WHERE doc_id = cluster_id),
       |samp AS (
       |  SELECT d.doc_id, d.lang,
       |    CASE WHEN ${Sampling.hashBucketSql("spl:", "d.doc_id")} < 800
       |           THEN 'train'
       |         WHEN ${Sampling.hashBucketSql("spl:", "d.doc_id")} < 900
       |           THEN 'valid'
       |         ELSE 'test' END AS split,
       |    CASE WHEN len(trim(d.text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
       |    END AS n_tokens
       |  FROM documents d JOIN keep USING (doc_id)
       |  WHERE ${Sampling.hashBucketSql("smp:", "d.doc_id")} < $rateCase)
       |SELECT lang, split, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
       |FROM samp WHERE n_tokens >= $minTokens
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
