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
    * lower-hashed newcomer, never by reordering). Ties broken by
    * doc_id so the rank is total.
    *
    * Scale shape (r10): selection is a bounded k-smallest-heap
    * AGGREGATE (`BottomKByKey` over the exact 60-bit salted hash), NOT
    * a `row_number` window partitioned on source. Map-side partials
    * carry ≤quota rows per (source, partition), so the dominant source
    * of a real crawl (common-crawl dump, one giant domain) never lands
    * on a single reducer. The window form is a scale-killer there: a
    * window partition must be wholly in one task and AQE's skew
    * mitigation splits JOIN partitions, never window partitions. The
    * per-source stats come from pure array HOFs over the ≤quota kept
    * rows — one shuffle total, no join-back.
    */
  def sourceQuota(documents: DataFrame, quota: Int = 20): DataFrame = {
    import graft.functions.BottomKByKey.bottom_k_by_key
    documents
      .groupBy("source")
      .agg(bottom_k_by_key(struct(
        hashBucketFull("quo:", col("doc_id")).as("key"),
        col("doc_id").as("id"),
        col("n_chars").as("payload")), quota).as("keep"))
      .select(col("source"),
        size(col("keep")).cast("bigint").as("n_kept"),
        array_min(transform(col("keep"), x => x.getField("id")))
          .as("min_doc"),
        array_max(transform(col("keep"), x => x.getField("id")))
          .as("max_doc"),
        aggregate(transform(col("keep"), x => x.getField("payload")),
          lit(0L), (a, x) => a + x).as("sum_chars"))
      .orderBy("source")
  }

  /** Full-range (un-modded) salted-md5 rank — a total deterministic
    * order for quota selection; 60 bits, portable (see
    * [[hashBucket]]).
    */
  def hashBucketFull(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("bigint")

  /** Deterministic corpus shuffle — the reproducible training-order
    * assignment a pretraining pipeline runs before sequence packing:
    * a salted 60-bit md5 key gives every document a stable
    * pseudo-random rank, documents land in `numShards` output shards
    * (key mod shards — the output-file axis) and take a dense
    * within-shard position ordered by (key, doc_id). (shard, pos) is
    * a total order that is layout-independent and append-stable for
    * existing docs; a fresh epoch-wide reshuffle is one salt change.
    * At 100 TB: one hash shuffle on shard + per-shard sorts — the
    * window partitions on shard, so no global single-partition sort
    * exists anywhere, and shards map 1:1 to writer output files.
    * Window bound (r10 convention): rows per partition ≈ N/numShards,
    * uniform because the shard tag is a salted-hash mod — size
    * numShards so one shard's rows fit an executor's sort buffer.
    */
  def deterministicShuffle(docs: DataFrame, salt: String = "shuf:",
      numShards: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("skey", "doc_id")
    docs.select(col("doc_id"))
      .withColumn("skey", hashBucketFull(salt, col("doc_id")))
      .withColumn("shard", pmod(col("skey"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .orderBy("shard", "pos")
  }

  def deterministicShuffleSql(salt: String = "shuf:",
      numShards: Int = 64): String = {
    val key = hashBucketFullSql(salt, "doc_id")
    s"""SELECT doc_id, $key AS skey, $key % $numShards AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY $key % $numShards
       |    ORDER BY $key, doc_id) AS BIGINT) AS pos
       |FROM documents
       |ORDER BY shard, pos""".stripMargin
  }

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

  /** EXACT-size deterministic sample — carving a fixed-K eval/audit
    * set (permille filters give expected sizes; an eval set must be
    * exactly K): the K smallest docs by the salted 60-bit hash with
    * doc_id tie-break — a total order, so the cut is deterministic,
    * layout-independent, and plans as `TakeOrderedAndProject`
    * (per-partition heaps, no global sort). Report: per-lang counts of
    * the carved set + id/hash extremes.
    */
  def exactKSample(documents: DataFrame, k: Int = 100): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        hashBucketFull("exk:", col("doc_id")).as("hk"))
      .orderBy(col("hk"), col("doc_id")).limit(k)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"),
        max("hk").as("max_hash"))
      .orderBy("lang")

  def exactKSampleSql(k: Int = 100): String =
    s"""WITH keyed AS (
       |  SELECT doc_id, lang, ${hashBucketFullSql("exk:", "doc_id")} AS hk
       |  FROM documents),
       |cut AS (SELECT * FROM keyed ORDER BY hk, doc_id LIMIT $k)
       |SELECT lang, COUNT(*) AS n, MIN(doc_id) AS min_doc,
       |  MAX(hk) AS max_hash
       |FROM cut GROUP BY 1 ORDER BY 1""".stripMargin

  /** Temperature-based mixture sampling (α-sampling, the multilingual
    * LM data-mixing rule): resample so language l's share follows
    * p_l^α instead of its natural share p_l — α < 1 flattens the
    * mixture, boosting low-resource languages and downsampling the
    * dominant one. α is fixed at 0.5 so the exponent is `sqrt`
    * (correctly rounded IEEE in both engines, hence portable — an
    * arbitrary `pow` is not). With target size T = N/2, language l's
    * keep-rate is min(1, q_l·T/n_l) with q_l = √n_l / Σ√n_m.
    *
    * Exactness: each √n is snapped to the 1e9 BIGINT grid up front, so
    * the normalizer Σ is an exact integer sum (order-free); the rate
    * computation is a fixed shape of IEEE double ops mirrored
    * token-for-token in the oracle. Membership is the repo's salted-
    * md5 permille filter — deterministic, layout-independent, stable
    * under appends.
    *
    * Scale: one hash-agg for the per-language counts (a handful of
    * rows), broadcast back over the corpus, pure-map filter —
    * identical shape to [[stratifiedSample]] but with DATA-DERIVED
    * rates.
    */
  def temperatureSample(documents: DataFrame): DataFrame = {
    val rates = permilleRates(
      documents.groupBy("lang").agg(count(lit(1)).as("n_docs")), "n_docs")
    documents.join(broadcast(rates), "lang")
      .groupBy("lang", "n_docs", "rate_permille")
      .agg(count(when(hashBucket("tmp:", col("doc_id")) < col("rate_permille"),
        lit(1))).as("n_kept"))
      .orderBy("lang")
  }

  /** α=0.5 permille keep-rates from per-language counts — THE
    * temperature-sampling formula, factored so every composition
    * ([[temperatureSample]], `CorpusPipeline.curate`) shares one copy:
    * the double-op sequence must stay token-identical with
    * [[permilleRatesCtes]] or cross-engine bit-parity breaks.
    * Input: (lang, `nCol`); output adds `rate_permille`.
    */
  private[operators] def permilleRates(counts: DataFrame,
      nCol: String): DataFrame = {
    val g = counts.withColumn("s",
      floor(sqrt(col(nCol).cast("double")) * lit(1e9) + lit(0.5))
        .cast("bigint"))
    val tot = g.agg(sum("s").as("stot"), sum(nCol).as("ntot"))
    g.crossJoin(broadcast(tot))
      .withColumn("rate_permille",
        least(lit(1000L),
          floor((lit(1000.0) * col("s")) / col("stot") *
            (col("ntot") / lit(2.0)) / col(nCol)).cast("bigint")))
      .drop("s", "stot", "ntot")
  }

  /** DuckDB twin of [[permilleRates]]: CTEs `g`/`tot`/`r` over a
    * source CTE holding (lang, `nCol`); `r` = (lang, nCol,
    * rate_permille).
    */
  private[operators] def permilleRatesCtes(srcCte: String,
      nCol: String): String =
    s"""g AS (SELECT lang, $nCol,
       |        CAST(floor(sqrt(CAST($nCol AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
       |          AS s
       |      FROM $srcCte),
       |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS stot,
       |               CAST(SUM($nCol) AS BIGINT) AS ntot FROM g),
       |r AS (SELECT lang, $nCol,
       |        least(1000, CAST(floor(
       |          (1000.0 * s) / stot * (ntot / 2.0) / $nCol) AS BIGINT))
       |          AS rate_permille
       |      FROM g, tot)""".stripMargin

  val temperatureSampleSql: String =
    s"""WITH n AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       |${permilleRatesCtes("n", "n_docs")}
       |SELECT r.lang, r.n_docs, r.rate_permille,
       |  COUNT(CASE WHEN ${hashBucketSql("tmp:", "doc_id")} < r.rate_permille
       |             THEN 1 END) AS n_kept
       |FROM documents d JOIN r ON d.lang = r.lang
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

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

  // ---------------------------------------------------------------
  // Weighted corpus mixing with epoch repetition (data recipes)
  // ---------------------------------------------------------------

  /** Per-source target mixing weights (permille of the output corpus,
    * summing to 1000) — the "data recipe" a pretraining run pins after
    * a DoReMi/ablation sweep. A deterministic fixture here; trained
    * weights drop in.
    */
  val mixPermille: Map[String, Int] = Map(
    "src0" -> 190, "src1" -> 170, "src2" -> 150, "src3" -> 130,
    "src4" -> 110, "src5" -> 90, "src6" -> 70, "src7" -> 50,
    "src8" -> 30, "src9" -> 10)

  /** Materialize a weighted corpus MIX — the recipe-application step
    * every pretraining run executes: each source `s` must contribute
    * `mixPermille(s)`‰ of an output corpus the size of the input, so
    * over-weighted sources REPEAT (multiple epochs — the standard
    * move when a recipe asks for more of a source than exists) and
    * under-weighted ones thin. With target_s = ⌊w_s·N/1000⌋ docs and
    * n_s available, every doc of `s` ships ⌊target_s/n_s⌋ full epochs
    * and joins the final partial epoch via the salted-md5 permille
    * filter (deterministic, layout-independent, append-stable — so
    * the realized epoch assignment of an existing doc never changes
    * when data is added). Output: per-(source, epoch) realized counts
    * against the per-source target.
    *
    * Scale shape: per-source counts are a hash-agg to ≤|sources| rows,
    * broadcast back; the epoch fan-out is a map-side
    * `explode(sequence(...))` (bounded by the recipe's max
    * over-weight, NOT by data size); the only other shuffle is the
    * stats agg. All arithmetic is 64-bit integer (`div`/`%`), so
    * every number is exact in DuckDB.
    */
  def mixEpochs(documents: DataFrame,
      permille: Map[String, Int] = mixPermille): DataFrame = {
    val w = permille.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col("source") === s, lit(p)).otherwise(acc)
    }
    val counts = documents.groupBy("source").agg(count(lit(1)).as("n_s"))
    val tot = documents.agg(count(lit(1)).as("n_tot"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("w", w)
      .withColumn("target_docs",
        expr("(CAST(w AS BIGINT) * n_tot) div 1000"))
      .withColumn("full_epochs", expr("target_docs div n_s"))
      .withColumn("extra_permille",
        expr("((target_docs % n_s) * 1000) div n_s"))
      .select("source", "target_docs", "full_epochs", "extra_permille")
    documents.select("doc_id", "source")
      .join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("target_docs"),
        col("full_epochs"), col("extra_permille"),
        explode(expr("sequence(CAST(0 AS BIGINT), full_epochs)"))
          .as("epoch"))
      .filter(col("epoch") < col("full_epochs") ||
        hashBucket("mix:", col("doc_id")) < col("extra_permille"))
      .groupBy("source", "epoch")
      .agg(count(lit(1)).as("n_docs"), max("target_docs").as("target_docs"))
      .orderBy("source", "epoch")
  }

  /** DuckDB oracle for [[mixEpochs]] — same integer arithmetic and
    * salted-md5 partial-epoch membership.
    */
  def mixEpochsSql(permille: Map[String, Int] = mixPermille): String = {
    val wCase = permille.toSeq.sortBy(_._1)
      .map { case (s, p) => s"WHEN '$s' THEN $p" }
      .mkString("CASE source ", " ", " ELSE 0 END")
    s"""WITH counts AS (
       |  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_tot FROM documents),
       |rates AS (
       |  SELECT source,
       |    (CAST(w AS BIGINT) * n_tot) // 1000 AS target_docs,
       |    ((CAST(w AS BIGINT) * n_tot) // 1000) // n_s AS full_epochs,
       |    ((((CAST(w AS BIGINT) * n_tot) // 1000) % n_s) * 1000) // n_s
       |      AS extra_permille
       |  FROM (SELECT source, n_s, $wCase AS w FROM counts) c, tot),
       |e AS (
       |  SELECT d.doc_id, d.source, u.epoch, r.full_epochs,
       |    r.extra_permille, r.target_docs
       |  FROM documents d
       |  JOIN rates r USING (source),
       |  UNNEST(range(0, r.full_epochs + 1)) AS u(epoch)
       |  WHERE u.epoch < r.full_epochs
       |     OR ${hashBucketSql("mix:", "d.doc_id")} < r.extra_permille)
       |SELECT source, epoch, COUNT(*) AS n_docs,
       |  MAX(target_docs) AS target_docs
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
