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
    hashBucketFull(salt, key) % 1000

  def hashBucketSql(salt: String, keyExpr: String): String =
    s"${hashBucketFullSql(salt, keyExpr)} % 1000"

  def hashBucketFullSql(salt: String, keyExpr: String): String =
    s"CAST('0x' || substring(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT)"

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

  /** Per-source quota capping — the anti-bias selection stage: keep at
    * most `quota` documents per source, chosen by salted-hash rank so
    * the selection is deterministic, layout-independent and stable
    * under appends (a kept doc is only ever displaced by a
    * lower-hashed newcomer, never by reordering). One window shuffle
    * keyed on source; ties broken by doc_id so the rank is total. At
    * 100 TB a hot source is exactly the case AQE skew-split handles —
    * the window partitions by source alone, nothing is global.
    */
  def sourceQuota(documents: DataFrame, quota: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(hashBucketFull("quo:", col("doc_id")), col("doc_id"))
    documents
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"),
        sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** Full-range (un-modded) salted-md5 rank — a total deterministic
    * order for quota selection; 60 bits, portable (see
    * [[hashBucket]]).
    */
  def hashBucketFull(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("bigint")

  def sourceQuotaSql(quota: Int = 20): String =
    s"""SELECT source, COUNT(*) AS n_kept,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${hashBucketFullSql("quo:", "doc_id")}, doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= $quota
       |GROUP BY source ORDER BY source""".stripMargin

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
