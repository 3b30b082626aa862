package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/serving-side compression step
  * of an embedding pipeline (int8 scalar quantization with a
  * per-vector scale, the ubiquitous baseline). Implemented entirely
  * with codegen'd array higher-order functions: no UDFs, no explode —
  * each vector is quantized in one fused map pass, so the operator is
  * a pure projection until the final per-label aggregate.
  *
  * Exactness: the quantizer itself is integer-valued
  * (`floor(x·127/m + 0.5)` on IEEE doubles — bit-deterministic in any
  * engine), and every cross-element / cross-row float reduction
  * travels as a scaled BIGINT (1e12 grid for squared errors, 1e9 for
  * scales), so sums are exact and order-free and the DuckDB oracle
  * hash-matches bit-for-bit. Per-element error contributions are
  * < 1e-4, so a 1e12 grid keeps group sums far below 2^63 even at
  * billions of vectors per label.
  */
object Quantize {

  /** Per-label int8-quantization report over `embeddings`: vector and
    * element counts, the summed L1 mass of the quantized codes (exact
    * BIGINT — a strong whole-pipeline checksum), the mean per-vector
    * absmax scale, and the mean squared reconstruction error.
    */
  def int8Stats(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("xs"))
      .withColumn("d", size(col("xs")).cast("bigint"))
      .withColumn("m",
        expr("aggregate(xs, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("qs", expr(
        """CASE WHEN m = 0.0 THEN transform(xs, x -> 0L)
          |ELSE transform(xs, x -> cast(floor(x * 127.0 / m + 0.5) as bigint))
          |END""".stripMargin))
      .withColumn("ql1", expr("aggregate(qs, 0L, (a, q) -> a + abs(q))"))
      .withColumn("e2s", expr(
        """aggregate(
          |  zip_with(xs, qs, (x, q) -> (x - q * m / 127.0) * (x - q * m / 127.0)),
          |  0L, (a, e) -> a + cast(floor(e * 1e12 + 0.5) as bigint))""".stripMargin))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum("d").as("total_elems"),
        sum("ql1").as("sum_q_l1"),
        // unrounded: exact-integer ratios are bit-identical across
        // engines (CLAUDE.md integer-ratio rule)
        (sum(floor(col("m") * lit(1e9) + lit(0.5)).cast("bigint"))
          .cast("double") / lit(1e9) / count(lit(1))).as("avg_absmax"),
        (sum("e2s").cast("double") / (sum("d").cast("double") * lit(1e12)))
          .as("avg_mse"))
      .orderBy("label")

  val int8StatsSql: String =
    """WITH v AS (
      |  SELECT label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
      |  FROM embeddings),
      |mm AS (
      |  SELECT label, CAST(len(xs) AS BIGINT) AS d, xs,
      |    COALESCE(list_max(list_transform(xs, x -> abs(x))), 0.0) AS m
      |  FROM v),
      |qq AS (
      |  SELECT label, d, m,
      |    CASE WHEN m = 0.0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(list_sum(list_transform(xs,
      |        x -> abs(CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))))
      |        AS BIGINT) END AS ql1,
      |    CASE WHEN m = 0.0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(list_sum(list_transform(xs, x -> CAST(floor(
      |          (x - CAST(floor(x * 127.0 / m + 0.5) AS BIGINT) * m / 127.0)
      |        * (x - CAST(floor(x * 127.0 / m + 0.5) AS BIGINT) * m / 127.0)
      |        * 1e12 + 0.5) AS BIGINT))) AS BIGINT) END AS e2s
      |  FROM mm)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(d) AS BIGINT) AS total_elems,
      |  CAST(SUM(ql1) AS BIGINT) AS sum_q_l1,
      |  CAST(SUM(CAST(floor(m * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 1e9 / COUNT(*) AS avg_absmax,
      |  CAST(SUM(e2s) AS DOUBLE) / (CAST(SUM(d) AS DOUBLE) * 1e12)
      |    AS avg_mse
      |FROM qq GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------
  // Product quantization (PQ) + asymmetric-distance top-k (ADC)
  // ---------------------------------------------------------------

  /** Shared PQ front end: per-(vector, subspace, code) squared L2
    * distances to the sample codebook, on the exact 1e6 BIGINT grid.
    *
    * Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) splits each `dims`-vector
    * into `m` subvectors and snaps each to the nearest of `k`
    * per-subspace centroids — `m·log₂k` bits per vector (8 bytes here
    * vs 256 for the raw floats), THE memory technique that lets a
    * billion-vector index live in RAM. The codebook is the
    * deterministic sample convention the IVF family uses (the `k`
    * lowest vec_ids' subvectors; a trained variant drops in via the
    * same frames).
    *
    * Exactness: subvector components are float→double (exact), each
    * squared difference is a correctly-rounded IEEE double identical
    * in both engines and SNAPS per element to a 1e12 BIGINT grid —
    * every downstream sum/argmin/ADC is exact integer arithmetic,
    * order-free, bit-identical in DuckDB (the per-element-grid
    * convention; replaced the r9 decimal group-sum carrier at ~2×
    * the speed).
    *
    * Scale shape (r18): the codebook is ONE broadcast row (array of
    * the k lowest vec_ids' embeddings, vec_id-sorted); every
    * (subspace, code) distance of a vector is a map-side HOF fold over
    * array slices — the former component explode (|corpus|·dims rows),
    * broadcast join (|corpus|·dims·k joined rows),
    * (vector, subspace, code) exchange and 2M-row checkpoint are GONE;
    * nothing is shuffled at all before the ADC pair aggregate. (HOF
    * lambdas evaluate interpreted — the win here is the eliminated
    * join/exchange/checkpoint volume, measured 3.67 → 1.23 s at
    * m=16·k=64; contrast the md5-signature experiment the same round
    * where interpretation overhead EXCEEDED the exchange savings.) Same per-element 1e12 BIGINT grid (r10
    * convention): v and c are float→double exact, v−c exact (24-bit
    * significands), the square and ×1e12 correctly rounded IEEE —
    * identical in DuckDB — and the BIGINT fold is order-free, so every
    * value is bit-identical to the exploded form the oracle mirrors.
    */
  private def pqCodebookRow(emb: DataFrame, k: Int): DataFrame =
    emb.filter(col("vec_id") < k)
      .agg(expr("array_sort(collect_list(struct(vec_id, embedding)))")
        .as("cb"))

  /** Per-row (m, code, dg) distance-table array over the broadcast
    * codebook — grouped by subspace first (all codes of subspace mi
    * are contiguous: entries mi·|cb|+1 … (mi+1)·|cb|), which the
    * argmin in [[pqTopK]] exploits with a plain slice.
    */
  private def pqDgsExpr(m: Int, subDim: Int): String =
    s"""IF(size(cb) = 0, CAST(array() AS
       |     ARRAY<STRUCT<m: INT, code: BIGINT, dg: BIGINT>>),
       |   flatten(transform(sequence(0, ${m - 1}), mi ->
       |     transform(cb, ce -> named_struct(
       |       'm', mi, 'code', ce.vec_id,
       |       'dg', aggregate(
       |         zip_with(slice(embedding, mi * $subDim + 1, $subDim),
       |                  slice(ce.embedding, mi * $subDim + 1, $subDim),
       |           (x, y) -> CAST(floor(
       |             (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
       |             (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * 1e12 + 0.5)
       |             AS BIGINT)),
       |         CAST(0 AS BIGINT), (acc, d) -> acc + d))))))""".stripMargin

  /** PQ top-k by asymmetric distance (ADC): corpus vectors are
    * represented ONLY by their `m` codes; each query keeps its exact
    * per-(subspace, code) distance table (m·k integers, broadcast),
    * and the approximate distance is the sum of `m` table lookups —
    * one broadcast join + one exact BIGINT sum per (query, vector),
    * finished by the bounded [[graft.functions.TopKByScore]] heap.
    */
  def pqTopK(emb: DataFrame, m: Int = 8, k: Int = 16,
      numQueries: Int = 10, topK: Int = 5, dims: Int = 64): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val subDim = dims / m
    // ONE map pass computes every vector's distance-table array; the
    // lazy barrier lets the two consumers below (corpus codes + query
    // tables) share that single pass and its single codebook broadcast
    // instead of re-running both per consumer (r18 A/B: the unshared
    // form cost +0.35 s at m=8·k=16 from the duplicated broadcast
    // build + dgs pass)
    val base = emb.crossJoin(broadcast(pqCodebookRow(emb, k)))
      .withColumn("dgs", expr(pqDgsExpr(m, subDim)))
      .select(col("vec_id"), expr("size(cb)").as("cbn"), col("dgs"))
      .localCheckpoint(eager = false)
    // corpus codes: per-subspace argmin folded map-side over the
    // contiguous slice of that subspace's codes (cb is vec_id-sorted,
    // strict < keeps the FIRST minimum = lowest code — exactly the old
    // min_by(code, struct(dg, code)) tie-break); no exchange at all
    val codes = base.select(col("vec_id"), explode(expr(
        s"""IF(cbn = 0, CAST(array() AS ARRAY<STRUCT<m: INT, code: BIGINT>>),
           |   transform(sequence(0, ${m - 1}), mi -> named_struct(
           |     'm', mi,
           |     'code', aggregate(slice(dgs, mi * cbn + 1, cbn),
           |       named_struct('code', CAST(NULL AS BIGINT),
           |                    'dg', CAST(NULL AS BIGINT)),
           |       (best, s) -> IF(best.dg IS NULL OR s.dg < best.dg,
           |         named_struct('code', s.code, 'dg', s.dg), best),
           |       best -> best.code))))""".stripMargin)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.code").as("code"))
    // query distance tables: the full (m, code, dg) array, exploded
    // for the numQueries query vectors only
    val qd = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), explode(col("dgs")).as("s"))
      .select(col("qid"), col("s.m").as("m"), col("s.code").as("code"),
        col("s.dg").as("dg"))
    codes.select(col("vec_id").as("cid"), col("m"), col("code"))
      .join(broadcast(qd), Seq("m", "code"))
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid")
      .agg(sum("dg").as("adc"))
      .withColumn("nscore", -(col("adc").cast("double")))
      .groupBy("qid")
      .agg(top_k_by_score(struct(col("nscore"), col("cid")), topK).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        (-col("col.score")).cast("bigint").as("adc"),
        (col("pos") + 1).as("rk"))
      .orderBy("qid", "rk")
  }

  def pqTopKSql(m: Int = 8, k: Int = 16, numQueries: Int = 10,
      topK: Int = 5, dims: Int = 64): String = {
    val subDim = dims / m
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |sub AS (
       |  SELECT vec_id, (i - 1) // $subDim AS m, (i - 1) % $subDim AS j,
       |    CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings CROSS JOIN dims),
       |cb AS (SELECT vec_id AS code, m, j, v AS c FROM sub
       |       WHERE vec_id < $k),
       |dist AS (
       |  SELECT s.vec_id, s.m, cb.code,
       |    CAST(SUM(CAST(floor((s.v - cb.c) * (s.v - cb.c) * 1e12 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS dg
       |  FROM sub s JOIN cb ON s.m = cb.m AND s.j = cb.j
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |        ORDER BY dg, code) AS rn
       |    FROM dist) t WHERE rn = 1),
       |adc AS (
       |  SELECT d.vec_id AS qid, c.vec_id AS cid,
       |    CAST(SUM(d.dg) AS BIGINT) AS adc
       |  FROM codes c JOIN dist d
       |    ON d.m = c.m AND d.code = c.code
       |    AND d.vec_id < $numQueries AND d.vec_id <> c.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, cid, adc,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, cid) AS rk
       |  FROM adc)
       |SELECT qid, cid, adc, rk FROM ranked WHERE rk <= $topK
       |ORDER BY qid, rk""".stripMargin
  }

  /** Recall@k of PQ-ADC against the EXACT squared-L2 top-k (same 1e6
    * grid, full-dimension) — the index-quality measurement that
    * justifies an (m, k) budget, itself bit-reproducible cross-engine
    * (the annRecall pattern). Honest fixture note: like
    * [[Similarity.rpRecall]], the isotropic random fixture has
    * neighbor gaps below any coarse quantizer's distortion (measured
    * ~0.16 at m=8, k=16); clustered real embeddings are the case PQ
    * exists for, and the measurement is the product.
    */
  def pqRecall(emb: DataFrame, m: Int = 8, k: Int = 16,
      numQueries: Int = 10, topK: Int = 5, dims: Int = 64): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    import graft.functions.VectorFunctions.decimal_dot
    // exact side via the norm trick ‖q−c‖² = ‖q‖² + ‖c‖² − 2·q·c:
    // each term is one decimal-exact fold cast to double ONCE, the
    // combination is three IEEE ops the oracle mirrors verbatim, and
    // the compiled decimal_dot kernel + broadcast query set replace
    // the exploded (pos)-join — the corpus maps through in one pass
    val n2e =
      """cast(aggregate(
        |  transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,18))),
        |  CAST(0 AS DECIMAL(38,18)),
        |  (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) as double)""".stripMargin
    val withN2 = emb.select(col("vec_id"), col("embedding"),
      expr(n2e).as("n2"))
    val queries = withN2.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"))
    val corpus = withN2.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("n2").as("c_n2"))
    val exact = broadcast(queries)
      .join(corpus, col("qid") =!= col("cid"))
      .withColumn("l2g",
        floor((col("q_n2") + col("c_n2") -
          lit(2.0) * decimal_dot(col("q_emb"), col("c_emb"))) * lit(1e6) +
          lit(0.5)).cast("bigint"))
      .withColumn("nscore", -(col("l2g").cast("double")))
      .groupBy("qid")
      .agg(top_k_by_score(struct(col("nscore"), col("cid")), topK).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cid"))
    val approx = pqTopK(emb, m, k, numQueries, topK, dims)
      .select(col("qid"), col("cid"), lit(1L).as("hit"))
    exact.join(broadcast(approx), Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_at_k",
        col("n_hits").cast("double") / col("k").cast("double"))
      .orderBy("qid")
  }

  def pqRecallSql(m: Int = 8, k: Int = 16, numQueries: Int = 10,
      topK: Int = 5, dims: Int = 64): String =
    s"""WITH approx AS (
       |${pqTopKSql(m, k, numQueries, topK, dims)}
       |), d2 AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |n2 AS (
       |  SELECT vec_id,
       |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS n2
       |  FROM embeddings CROSS JOIN d2 GROUP BY 1),
       |prod AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN embeddings c
       |    ON q.vec_id < $numQueries AND q.vec_id <> c.vec_id
       |  CROSS JOIN d2
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
       |        CAST(floor((nq.n2 + nc.n2 - 2.0 * dot) * 1e6 + 0.5)
       |          AS BIGINT), cid) AS rk
       |    FROM prod
       |    JOIN n2 nq ON qid = nq.vec_id
       |    JOIN n2 nc ON cid = nc.vec_id) t
       |  WHERE rk <= $topK)
       |SELECT e.qid, COUNT(*) AS k,
       |  CAST(COALESCE(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_hits,
       |  CAST(COALESCE(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / COUNT(*) AS recall_at_k
       |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
