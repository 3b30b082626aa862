package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting — the selection stage of
  * a training-data pipeline (downsample over-represented strata, carve
  * reproducible train/valid/test splits). Everything is a pure
  * function of the row key via a salted md5 bucket, so a sample is:
  *
  *   - reproducible: re-running over re-partitioned / re-ordered data
  *     selects the same rows (unlike `df.sample`, whose outcome depends
  *     on partition layout);
  *   - stable under appends: existing rows never change stratum or
  *     split when new data arrives;
  *   - engine-portable: the bucket uses the repo's 15-hex-digit md5
  *     convention (60 bits — see CLAUDE.md), so DuckDB reproduces the
  *     exact row set and the driver hash-checks it bit-for-bit.
  *
  * At 100 TB this is a narrow projection + codegen'd filter — no
  * shuffle, no state, embarrassingly parallel.
  */
object Sampling {

  /** Uniform bucket in [0, 1000) from a salted md5 of `key` (cast to
    * string). 15 hex digits = 60 bits, always non-negative, identical
    * in DuckDB via `CAST('0x'||substring(md5(…),1,15) AS BIGINT)`.
    */
  def hashBucket(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("bigint") % 1000

  def hashBucketSql(salt: String, keyExpr: String): String =
    s"CAST('0x' || substring(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT) % 1000"

  /** Per-language permille keep rates for the driver entry: keep
    * English-heavy corpus balanced by downsampling `en`, keep the rest
    * at higher rates. Unlisted languages fall back to `defaultPermille`.
    */
  val ratePermille: Seq[(String, Int)] =
    Seq("en" -> 400, "de" -> 900, "es" -> 900, "fr" -> 900, "zh" -> 700)
  val defaultPermille: Int = 500

  /** Stratified deterministic sample of `documents` + reproducible
    * train/valid/test split (80/10/10 on an independent salt). The
    * sampling and split hashes use different salts so membership and
    * split assignment are independent.
    */
  def stratifiedSample(documents: DataFrame): DataFrame = {
    val rate = ratePermille.foldLeft(lit(defaultPermille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    val spl = hashBucket("spl:", col("doc_id"))
    documents
      .filter(hashBucket("smp:", col("doc_id")) < rate)
      .select(col("doc_id"), col("lang"), col("source"),
        when(spl < 800, "train").when(spl < 900, "valid").otherwise("test")
          .as("split"))
      .orderBy("doc_id")
  }

  def stratifiedSampleSql: String = {
    val rateCase = ratePermille
      .map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", s" ELSE $defaultPermille END")
    s"""SELECT doc_id, lang, source,
       |  CASE WHEN ${hashBucketSql("spl:", "doc_id")} < 800 THEN 'train'
       |       WHEN ${hashBucketSql("spl:", "doc_id")} < 900 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM documents
       |WHERE ${hashBucketSql("smp:", "doc_id")} < $rateCase
       |ORDER BY doc_id""".stripMargin
  }
}
