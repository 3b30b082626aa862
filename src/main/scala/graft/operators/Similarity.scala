package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ArrayType(FloatType)`)
  * — training-pipeline extension (builder brief). Two tiers:
  *
  *  - [[cosineTopK]]: exact brute-force top-k — the correctness
  *    baseline, a broadcast-join of the (small) query set against the
  *    full corpus; one pass, no shuffle of the corpus.
  *  - [[annLshTopK]]: random-hyperplane LSH bucketing — the 100 TB
  *    path: corpus is bucketed once by sign-pattern code (shuffle on
  *    bucket key), queries probe only their own bucket.
  *
  * Dot products fold per-element products (deterministic order) through
  * an exact DECIMAL accumulator, so cosine values are bit-identical to
  * the DuckDB oracle's per-dimension-summed equivalent — same rationale
  * as [[Kernels.dsum]].
  */
object Similarity {

  // the per-pair exact-decimal dot is the compiled
  // [[graft.functions.DecimalDotProduct]] kernel (same semantics as a
  // CAST(... AS DECIMAL(30,18)) zip_with fold, ~10x faster); per-row
  // norms below keep the HOF form (computed once per vector)

  private val normExpr: String =
    """sqrt(CAST(aggregate(
      |  transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,18))),
      |  CAST(0 AS DECIMAL(38,18)),
      |  (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) AS DOUBLE))""".stripMargin

  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("nrm", expr(normExpr))

  /** Brute-force cosine top-k: for each query vector (`vec_id` in
    * `queryIds`... here: vec_id < numQueries), the k nearest corpus
    * vectors by cosine similarity. The query side is tiny → broadcast;
    * the corpus streams through in one pass; ranking is a window
    * partitioned by query (shuffle of |Q|·|C| scored pairs — at real
    * scale cap |Q| per job or use [[annLshTopK]]).
    */
  def cosineTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val withN = withNorm(embeddings)
    val queries = withN.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val corpus = withN.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    // rounded to 6 decimals: decimal→double casts can differ by 1 ulp
    // between engines at 19 significant digits; ranking on the rounded
    // value keeps row_number deterministic cross-engine too
    val scored = broadcast(queries)
      .join(corpus, col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.decimal_dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
    // window bound (r10 convention): partition = qid over the FULL
    // corpus — this window form is the ORACLE-TWIN formulation kept
    // for cross-engine rank parity; the production ranking is
    // [[cosineTopKAgg]]'s TopKByScore bounded heap.
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  /** [[cosineTopK]] finished by the bounded [[graft.functions.TopKByScore]]
    * aggregate instead of a window: map-side k-capped heaps mean the
    * shuffle carries ≤k candidates per (query, partition) — the shape
    * that survives |corpus| ≫ memory. Same scored pairs (decimal-exact,
    * rounded) → identical results and the same oracle as the window
    * form.
    */
  def cosineTopKAgg(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val withN = withNorm(embeddings)
    val queries = withN.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val corpus = withN.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    broadcast(queries)
      .join(corpus, col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.decimal_dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .groupBy("qid")
      .agg(top_k_by_score(struct(col("cosine"), col("cid")), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as("cosine"), (col("pos") + 1).as("rk"))
      .orderBy("qid", "rk")
  }

  /** DuckDB oracle for [[cosineTopK]] (dims=64 fixture vectors):
    * identical decimal-exact dot products via per-dimension expansion.
    */
  def cosineTopKSql(numQueries: Int = 10, k: Int = 5, dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |prod AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN embeddings c ON q.vec_id < $numQueries AND q.vec_id <> c.vec_id
       |  CROSS JOIN dims
       |  GROUP BY 1, 2),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |cosd AS (
       |  SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
       |  FROM prod
       |  JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON cid = nc.vec_id),
       |ranked AS (
       |  SELECT qid, cid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
       |  FROM cosd)
       |SELECT qid, cid, cosine, rk FROM ranked WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin

  /** ANN via random-hyperplane LSH: `numPlanes` pseudo-random
    * hyperplanes (components derived deterministically from
    * xxhash64(plane, dim) — no RNG state, reproducible on any
    * cluster), each vector coded by its sign pattern; queries probe
    * only their own bucket. Recall < 1 by construction — pair with
    * multi-probe or band-OR for production recall targets; engine-side
    * the point is the shuffle shape: corpus bucketed once, probes are
    * a per-bucket join.
    */
  def annLshTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      numPlanes: Int = 8): DataFrame = {
    // code bit p = sign(dot(emb, plane p)); plane components centered in
    // [-0.4995, 0.4995] via pmod ([[graft.functions.HyperplaneLsh]]) —
    // a single fused codegen'd pass over the vector, not numPlanes
    // interpreted aggregate() HOFs
    val coded = embeddings.withColumn("bucket",
      graft.functions.VectorFunctions.hyperplane_bucket(col("embedding"), numPlanes))
    val queries = coded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("bucket"))
    val corpus = coded.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("bucket"))
    // hot path: fused codegen'd cosine (custom Expression), not the
    // decimal-exact fold the oracle-checked brute-force query uses
    val scored = broadcast(queries)
      .join(corpus, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", graft.functions.VectorFunctions
        .cosine_sim(col("q_emb"), col("c_emb")))
    // window bound (r10 convention): partition = qid, one per probe
    // query (numQueries is small by contract); rows = the query's
    // candidate set after the bucket/cell join, occupancy-bounded by
    // the index geometry. At production occupancy swap the ranking to
    // the TopKByScore bounded heap (the [[cosineTopKAgg]] pattern).
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "bucket", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  /** [[annLshTopK]] with a cross-engine-portable hash family —
    * md5-derived hyperplane weights ([[graft.functions.Md5Planes]])
    * and decimal-exact bucket signs + cosine scoring, making the whole
    * pipeline DuckDB-oracle-checkable (hard evidence the
    * bucket-and-probe shape is right). The xxhash64 + codegen'd-cosine
    * form stays the bench path.
    */
  def annLshTopKMd5(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      numPlanes: Int = 8, dims: Int = 64): DataFrame = {
    // one band of numPlanes sign bits — same fused compiled coder as
    // [[embeddingNearDups]] (exact DECIMAL(38,18) sign semantics)
    val coded = withNorm(embeddings).withColumn("bucket",
      graft.functions.VectorFunctions
        .md5_band_codes(col("embedding"), 1, numPlanes).getItem(0))
    val queries = coded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val corpus = coded.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"), col("bucket"))
    // window bound (r10 convention): partition = qid, one per probe
    // query (numQueries is small by contract); rows = the query's
    // candidate set after the bucket/cell join, occupancy-bounded by
    // the index geometry. At production occupancy swap the ranking to
    // the TopKByScore bounded heap (the [[cosineTopKAgg]] pattern).
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    broadcast(queries)
      .join(corpus, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.decimal_dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "bucket", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  /** DuckDB oracle for [[annLshTopKMd5]]. */
  def annLshTopKMd5Sql(numQueries: Int = 10, k: Int = 5, numPlanes: Int = 8,
      dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |proj AS (
       |  SELECT p, i,
       |    (CAST(CAST('0x' || substring(md5(p || ':' || (i - 1)), 1, 15) AS BIGINT) % 1000
       |      AS DOUBLE) - 499.5) / 1000.0 AS w
       |  FROM (SELECT UNNEST(range(0, $numPlanes)) AS p) planes CROSS JOIN dims),
       |bits AS (
       |  SELECT e.vec_id, pr.p,
       |    CASE WHEN SUM(CAST(CAST(e.embedding[pr.i] AS DOUBLE) * pr.w
       |                  AS DECIMAL(30,18))) >= 0
       |         THEN (1 << pr.p) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN proj pr
       |  GROUP BY 1, 2),
       |codes AS (
       |  SELECT vec_id, CAST(SUM(bit) AS INTEGER) AS bucket
       |  FROM bits GROUP BY 1),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |prod AS (
       |  SELECT q.vec_id AS qid, cq.bucket, c.vec_id AS cid,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN codes cq ON q.vec_id = cq.vec_id AND q.vec_id < $numQueries
       |  JOIN codes cc ON cc.bucket = cq.bucket
       |  JOIN embeddings c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id
       |  CROSS JOIN dims
       |  GROUP BY 1, 2, 3),
       |cosd AS (
       |  SELECT qid, bucket, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
       |  FROM prod
       |  JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON cid = nc.vec_id),
       |ranked AS (
       |  SELECT qid, bucket, cid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
       |  FROM cosd)
       |SELECT qid, bucket, cid, cosine, rk FROM ranked WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin

  /** Embedding-cosine near-dup pairs (the dedup-family member over
    * vectors, brief §dedup): the textbook LSH OR-construction —
    * `bands` independent code tables of `rowsPerBand` hyperplanes
    * each; a pair is a candidate if it shares a code in ANY band
    * (recall 1−(1−s^r)^B for bit-agreement s), then candidates are
    * verified with the exact-decimal cosine ≥ `minCosine`. Candidate
    * generation shuffles (band, code) rows — never all pairs; only
    * bucket-mates are scored. md5-portable planes + decimal
    * verification → fully oracle-checkable.
    */
  def embeddingNearDups(embeddings: DataFrame, minCosine: Double = 0.4,
      rowsPerBand: Int = 4, bands: Int = 4, dims: Int = 64): DataFrame = {
    // one fused compiled pass emits all band codes with the exact
    // DECIMAL(38,18) sign semantics ([[graft.functions.Md5BandCodes]])
    // — replaces bands × rowsPerBand interpreted decimal HOF folds
    val coded = withNorm(embeddings).select(
      col("vec_id"), col("embedding"), col("nrm"),
      posexplode(graft.functions.VectorFunctions
        .md5_band_codes(col("embedding"), bands, rowsPerBand))
        .as(Seq("band", "code")))
    // vectors ride through the band self-join (the banded shuffle
    // grows by the vector payload × bands — the classic trade against
    // re-joining the corpus twice per candidate pair; here it also
    // removes the large pre-verify pair `distinct()` shuffle), so the
    // codegen'd float cosine discards the vast majority of candidates
    // at (τ − margin) IMMEDIATELY — float and decimal cosine agree to
    // ~1e-9, so a 0.01 margin provably drops no qualifying pair — and
    // only the tiny surviving set is deduped across bands and given
    // the exact-decimal, oracle-exact ≥ τ decision
    val scored = coded.as("a")
      .join(coded.as("b"),
        col("a.band") === col("b.band") && col("a.code") === col("b.code") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorFunctions
        .cosine_sim(col("a.embedding"), col("b.embedding")) >= minCosine - 0.01)
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        col("a.embedding").as("q_emb"), col("b.embedding").as("c_emb"),
        col("a.nrm").as("q_nrm"), col("b.nrm").as("c_nrm"))
    scored.groupBy("d1", "d2")
      .agg(first("q_emb").as("q_emb"), first("c_emb").as("c_emb"),
        first("q_nrm").as("q_nrm"), first("c_nrm").as("c_nrm"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.decimal_dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .filter(col("cosine") >= minCosine)
      .select("d1", "d2", "cosine")
      .orderBy("d1", "d2")
  }

  /** DuckDB oracle for [[embeddingNearDups]]. */
  def embeddingNearDupsSql(minCosine: Double = 0.4, rowsPerBand: Int = 4,
      bands: Int = 4, dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |proj AS (
       |  SELECT p, i,
       |    (CAST(CAST('0x' || substring(md5(p || ':' || (i - 1)), 1, 15) AS BIGINT) % 1000
       |      AS DOUBLE) - 499.5) / 1000.0 AS w
       |  FROM (SELECT UNNEST(range(0, ${rowsPerBand * bands})) AS p) planes
       |  CROSS JOIN dims),
       |bits AS (
       |  SELECT e.vec_id, pr.p,
       |    CASE WHEN SUM(CAST(CAST(e.embedding[pr.i] AS DOUBLE) * pr.w
       |                  AS DECIMAL(30,18))) >= 0
       |         THEN (1 << (pr.p % $rowsPerBand)) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN proj pr
       |  GROUP BY 1, 2),
       |codes AS (
       |  SELECT vec_id, p // $rowsPerBand AS band,
       |    CAST(SUM(bit) AS INTEGER) AS code
       |  FROM bits GROUP BY 1, 2),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
       |  FROM codes a JOIN codes b
       |    ON a.band = b.band AND a.code = b.code AND a.vec_id < b.vec_id),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |prod AS (
       |  SELECT cd.d1, cd.d2,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM cands cd
       |  JOIN embeddings q ON q.vec_id = cd.d1
       |  JOIN embeddings c ON c.vec_id = cd.d2
       |  CROSS JOIN dims
       |  GROUP BY 1, 2)
       |SELECT d1, d2, round(dot / (n1.nrm * n2.nrm), 6) AS cosine
       |FROM prod
       |JOIN norms n1 ON d1 = n1.vec_id
       |JOIN norms n2 ON d2 = n2.vec_id
       |WHERE round(dot / (n1.nrm * n2.nrm), 6) >= $minCosine
       |ORDER BY d1, d2""".stripMargin

  /** IVF-style ANN: coarse-quantize the corpus by nearest centroid
    * (here the per-label centroids as the codebook — in production the
    * codebook comes from k-means, [[graft.ml.MLParity.kmeans]]), then
    * probe only the query's cell. Corpus assignment is one broadcast
    * pass; the probe is a per-cell join — the IVF counterpart of
    * [[annLshTopK]]'s hyperplane bucketing.
    */
  def ivfTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val cents = labelCentroids(embeddings)
      .select(col("label").as("cell"),
        col("centroid").cast("array<float>").as("centroid"))
    // nearest-cell argmax as a max_by aggregate (ties → lowest cell):
    // map-side combine collapses the |corpus| × |cells| expansion to
    // one row per vector per partition BEFORE the shuffle — the window
    // form shuffled and sorted every scored copy
    val assigned = embeddings
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim", cosine_sim(col("embedding"), col("centroid")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("embedding"), col("cell")),
        struct(col("cent_sim"), (-col("cell")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cell").as("cell"))
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("cell"))
    val corpus = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("cell"))
    // window bound (r10 convention): partition = qid, one per probe
    // query (numQueries is small by contract); rows = the query's
    // candidate set after the bucket/cell join, occupancy-bounded by
    // the index geometry. At production occupancy swap the ranking to
    // the TopKByScore bounded heap (the [[cosineTopKAgg]] pattern).
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    broadcast(queries)
      .join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", cosine_sim(col("q_emb"), col("c_emb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cell", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  /** [[ivfTopK]] with every numeric step exact-decimal and rounded —
    * centroid means, cell assignment sims, and probe cosines all fold
    * through `DECIMAL(30,18)` with `round(…, 6)` at comparison points,
    * so the whole coarse-quantize → probe pipeline is fully
    * DuckDB-oracle-checkable (the codegen'd `cosine_sim` form stays
    * the bench path). Same scale shape: codebook broadcast once,
    * probes are a per-cell join.
    */
  def ivfTopKExact(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val cents = labelCentroidsFlat(embeddings)
      .groupBy(col("label").as("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), x -> x.mean)")
        .as("centroid"))
      .withColumn("cnrm", expr(
        """sqrt(CAST(aggregate(
          |  transform(centroid, x -> CAST(x * x AS DECIMAL(30,18))),
          |  CAST(0 AS DECIMAL(38,18)),
          |  (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) AS DOUBLE))""".stripMargin))
    // compiled kernel with the identical DECIMAL(38,18) fold semantics
    // (see [[graft.functions.DecimalDotFD]]) — the cell-assignment
    // cross join is |corpus| × |cells| dots, the twin's hot spot
    val assignDot = graft.functions.VectorFunctions
      .decimal_dot_fd(col("embedding"), col("centroid"))
    // same max_by argmax as [[ivfTopK]] (ties → lowest cell after the
    // 6-decimal rounding, matching the oracle's row_number ordering)
    val assigned = withNorm(embeddings)
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim", round(assignDot / (col("nrm") * col("cnrm")), 6))
      .groupBy("vec_id")
      .agg(max_by(struct(col("embedding"), col("nrm"), col("cell")),
        struct(col("cent_sim"), (-col("cell")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.nrm").as("nrm"), col("best.cell").as("cell"))
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell"))
    val corpus = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"), col("cell"))
    // window bound (r10 convention): partition = qid, one per probe
    // query (numQueries is small by contract); rows = the query's
    // candidate set after the bucket/cell join, occupancy-bounded by
    // the index geometry. At production occupancy swap the ranking to
    // the TopKByScore bounded heap (the [[cosineTopKAgg]] pattern).
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    broadcast(queries)
      .join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.decimal_dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cell", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  /** DuckDB oracle for [[ivfTopKExact]]. */
  def ivfTopKExactSql(numQueries: Int = 10, k: Int = 5, dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |cent AS (
       |  SELECT label AS cell, i AS ci,
       |    round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,18)))
       |          AS DOUBLE) / COUNT(*), 6) AS mean
       |  FROM embeddings CROSS JOIN dims GROUP BY 1, 2),
       |cnorm AS (
       |  SELECT cell, sqrt(CAST(SUM(CAST(mean * mean AS DECIMAL(30,18)))
       |         AS DOUBLE)) AS cnrm
       |  FROM cent GROUP BY 1),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |adot AS (
       |  SELECT e.vec_id, c.cell,
       |    CAST(SUM(CAST(CAST(e.embedding[c.ci] AS DOUBLE) * c.mean
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings e CROSS JOIN cent c GROUP BY 1, 2),
       |asim AS (
       |  SELECT a.vec_id, a.cell, round(a.dot / (n.nrm * cn.cnrm), 6) AS cs
       |  FROM adot a
       |  JOIN norms n ON a.vec_id = n.vec_id
       |  JOIN cnorm cn ON a.cell = cn.cell),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
       |    FROM asim) t WHERE rn = 1),
       |prod AS (
       |  SELECT q.vec_id AS qid, aq.cell, c.vec_id AS cid,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN assigned aq ON q.vec_id = aq.vec_id AND q.vec_id < $numQueries
       |  JOIN assigned ac ON ac.cell = aq.cell
       |  JOIN embeddings c ON c.vec_id = ac.vec_id AND c.vec_id <> q.vec_id
       |  CROSS JOIN dims
       |  GROUP BY 1, 2, 3),
       |cosd AS (
       |  SELECT qid, cell, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
       |  FROM prod
       |  JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON cid = nc.vec_id),
       |ranked AS (
       |  SELECT qid, cell, cid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
       |  FROM cosd)
       |SELECT qid, cell, cid, cosine, rk FROM ranked WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin

  /** ANN quality evaluation — recall@k of the IVF index against the
    * brute-force ground truth, per query: |approx ∩ exact| / k. The
    * measurement every production ANN deployment runs before trusting
    * an index; here it is ITSELF oracle-checked, because both inputs
    * are the exact-decimal twins ([[cosineTopKAgg]] ground truth,
    * [[ivfTopKExact]] index) whose DuckDB oracles compose as CTEs —
    * the recall number is bit-for-bit reproducible cross-engine, not
    * a sampled estimate. Scale shape: both sides are the already-
    * audited pipelines; the overlap join is k·queries rows.
    */
  def annRecall(embeddings: DataFrame, numQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val exact = cosineTopKAgg(embeddings, numQueries, k)
      .select(col("qid"), col("cid"))
    val approx = ivfTopKExact(embeddings, numQueries, k)
      .select(col("qid"), col("cid"), lit(1L).as("hit"))
    // the index side is k·queries rows — broadcast, never a sort
    exact.join(broadcast(approx), Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      // exact-integer ratio — unrounded by the house rule
      .withColumn("recall_at_k",
        col("n_hits").cast("double") / col("k").cast("double"))
      .orderBy("qid")
  }

  /** DuckDB oracle for [[annRecall]] — the two twins' oracles spliced
    * as CTE subqueries (each keeps its own WITH scope).
    */
  def annRecallSql(numQueries: Int = 10, k: Int = 5,
      dims: Int = 64): String =
    s"""WITH exact AS (
       |${cosineTopKSql(numQueries, k, dims)}
       |), approx AS (
       |${ivfTopKExactSql(numQueries, k, dims)}
       |)
       |SELECT e.qid, COUNT(*) AS k,
       |  CAST(COALESCE(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_hits,
       |  CAST(COALESCE(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / COUNT(*) AS recall_at_k
       |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** IVF over a k-means-TRAINED codebook — [[ivfTopK]] borrows the
    * corpus's `label` column as its coarse quantizer; a real IVF index
    * trains the codebook unsupervised (Lloyd's algorithm), which is
    * what this operator does: `iters` assignment rounds with a
    * centroid (per-cell element-wise mean) update between each, seeded
    * deterministically with the embeddings of the `cells` lowest
    * vec_ids, then each query probes only its own cell.
    *
    * Scale shape: the codebook is always broadcast (cells × dims
    * doubles); each training round is one pass over the corpus — the
    * |corpus| × cells scores collapse to one row per vector via the
    * map-side `max_by` partial aggregate BEFORE the shuffle — and the
    * update is a posexplode mean shuffling (cell, pos) pairs. Nothing
    * is ever all-pairs. At 100 TB you'd train on a deterministic
    * hash-sample ([[Sampling.hashBucket]]) and run one final
    * full-corpus assignment; the fixture corpus is small enough to
    * train on in full, which keeps the oracle twin in lock-step.
    */
  def ivfKmeansTopK(embeddings: DataFrame, cells: Int = 8, iters: Int = 2,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    require(iters >= 1, "k-means needs at least one assignment round")
    var cents = embeddings.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      // nearest-cell argmax, ties → lowest cell (same shape as ivfTopK)
      assigned = embeddings
        .crossJoin(broadcast(cents))
        .withColumn("cent_sim", cosine_sim(col("embedding"), col("centroid")))
        .groupBy("vec_id")
        .agg(max_by(struct(col("embedding"), col("cell")),
          struct(col("cent_sim"), (-col("cell")).as("nc"))).as("best"))
        .select(col("vec_id"), col("best.embedding").as("embedding"),
          col("best.cell").as("cell"))
      if (i < iters) cents = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg(avg(col("col")).as("mean"))
        .groupBy("cell")
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, mean))), x -> CAST(x.mean AS FLOAT))")
          .as("centroid"))
        // cut the Lloyd lineage per round (cells×dims rows — tiny):
        // without it round i's broadcast replays assignments 1…i−1
        // over the corpus — quadratic corpus passes in iters (the
        // bpeMerges lesson). eager=false so merely constructing the
        // entry stays lazy (the curate lesson).
        .localCheckpoint(eager = false)
    }
    // the final assignment feeds BOTH the query and the corpus side of
    // the probe join — checkpoint so it's one corpus pass, not two
    assigned = assigned.localCheckpoint(eager = false)
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("cell"))
    val corpus = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("cell"))
    // window bound (r10 convention): partition = qid, one per probe
    // query (numQueries is small by contract); rows = the query's
    // candidate set after the bucket/cell join, occupancy-bounded by
    // the index geometry. At production occupancy swap the ranking to
    // the TopKByScore bounded heap (the [[cosineTopKAgg]] pattern).
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    broadcast(queries)
      .join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", cosine_sim(col("q_emb"), col("c_emb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cell", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  /** [[ivfKmeansTopK]] with every numeric step exact-decimal and
    * rounded — the oracle twin proving the whole train → assign →
    * probe pipeline bit-for-bit against DuckDB ([[ivfKmeansTopKSql]]
    * unrolls the same Lloyd rounds as SQL CTEs). Centroid means and
    * assignment/probe cosines fold through `DECIMAL(30,18)` with
    * `round(…, 6)` at every comparison point, the [[ivfTopKExact]]
    * convention. Same dataflow as the float path; only the arithmetic
    * carrier differs.
    */
  def ivfKmeansTopKExact(embeddings: DataFrame, cells: Int = 8, iters: Int = 2,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.decimal_dot
    // final assignment read twice (queries + corpus) — the trainer's
    // lazy checkpoint makes it one corpus pass, not two
    val assigned = lloydAssignExact(embeddings, cells, iters)
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell"))
    val corpus = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"), col("cell"))
    // window bound (r10 convention): partition = qid, one per probe
    // query (numQueries is small by contract); rows = the query's
    // candidate set after the bucket/cell join, occupancy-bounded by
    // the index geometry. At production occupancy swap the ranking to
    // the TopKByScore bounded heap (the [[cosineTopKAgg]] pattern).
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    broadcast(queries)
      .join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(decimal_dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cell", "cid", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  // Exact-decimal Lloyd trainer shared by ivfKmeansTopKExact,
  // semanticDedup and the semantic store: `iters` assignment rounds
  // over a broadcast codebook seeded from the `cells` lowest vec_ids,
  // every centroid mean and cosine folded through DECIMAL(30,18) with
  // round(…, 6) at each comparison point, so the resulting assignment
  // is bit-reproducible in DuckDB (lloydCtesSql is the matching CTE
  // generator). One row per vector: (vec_id, embedding, nrm, cell,
  // csim) where csim is the rounded cosine to the assigned centroid —
  // the argmax score itself, kept because SemDeDup ranks duplicate-
  // group members by centroid similarity. Lazily checkpointed:
  // constructing a consumer stays plan-only, and all readers share one
  // materialized pass.
  private val cnrmExpr: String =
    """sqrt(CAST(aggregate(
      |  transform(centroid, x -> CAST(x * x AS DECIMAL(30,18))),
      |  CAST(0 AS DECIMAL(38,18)),
      |  (acc, v) -> CAST(acc + v AS DECIMAL(38,18))) AS DOUBLE))""".stripMargin

  /** One exact-decimal assignment pass: every vector of
    * `vecsWithNorm` (must carry `nrm` — see [[withNorm]]) scored
    * against the broadcast codebook `cents` (`cell`, `centroid`),
    * argmax by (rounded centroid cosine desc, cell asc) as a map-side
    * partial `max_by`. Shared verbatim by the Lloyd training rounds
    * and the store-fed incremental assignment, so a delta batch is
    * assigned EXACTLY as the base corpus was.
    */
  private[operators] def assignToCodebook(vecsWithNorm: DataFrame,
      cents: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.decimal_dot_fd
    val cb = cents.withColumn("cnrm", expr(cnrmExpr))
    vecsWithNorm
      .crossJoin(broadcast(cb))
      .withColumn("cent_sim", round(
        decimal_dot_fd(col("embedding"), col("centroid"))
          / (col("nrm") * col("cnrm")), 6))
      .groupBy("vec_id")
      .agg(max_by(
        struct(col("embedding"), col("nrm"), col("cell"), col("cent_sim")),
        struct(col("cent_sim"), (-col("cell")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.nrm").as("nrm"), col("best.cell").as("cell"),
        col("best.cent_sim").as("csim"))
  }

  /** [[lloydAssignExact]] returning BOTH halves of the trained state:
    * the final codebook (the centroids the LAST assignment round
    * scored against — what an index/store persists) and the final
    * assignment. The codebook frame shares the per-round lazy
    * checkpoints, so materializing the assignment first makes the
    * codebook read nearly free.
    */
  private[operators] def lloydTrainExact(embeddings: DataFrame,
      cells: Int, iters: Int,
      hashSeeds: Boolean = false): (DataFrame, DataFrame) = {
    require(iters >= 1, "k-means needs at least one assignment round")
    // init: float→double casts are exact, so both engines start from
    // the identical codebook without any rounding step.
    // Seeding: default = the `cells` lowest vec_ids (oracle-mirrored,
    // lloydCtesSql). hashSeeds = the `cells` lowest (salted-md5,
    // vec_id) — a deterministic uniform sample of the CURRENT corpus,
    // so a dense region holding p% of the vectors attracts ~p% of the
    // seeds (the k-means++-lite a bit-reproducible engine affords);
    // lowest-id seeding would pin every centroid in the oldest data
    // region, which is why [[rebuildSemanticStore]] uses this.
    val seeds =
      if (hashSeeds) embeddings.orderBy(
        graft.operators.Sampling.hashBucketFull("lloydseed:",
          col("vec_id")), col("vec_id")).limit(cells)
      else embeddings.filter(col("vec_id") < cells)
    var cents = seeds
      .select(col("vec_id").as("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid"))
    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      assigned = assignToCodebook(withNorm(embeddings), cents)
      if (i < iters) cents = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg(round(
          sum(col("col").cast("double").cast("decimal(30,18)")).cast("double")
            / count(lit(1)), 6).as("mean"))
        .groupBy("cell")
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, mean))), x -> x.mean)")
          .as("centroid"))
        // per-round lineage cut, same as the float path: lazy so entry
        // construction doesn't execute, materialized once per round
        .localCheckpoint(eager = false)
    }
    (cents, assigned.localCheckpoint(eager = false))
  }

  private[operators] def lloydAssignExact(embeddings: DataFrame,
      cells: Int, iters: Int): DataFrame =
    lloydTrainExact(embeddings, cells, iters)._2

  /** DuckDB oracle for [[ivfKmeansTopKExact]]: the Lloyd rounds
    * unrolled as CTE generations — `cent_j` (codebook), `cn_j` (norm),
    * `as_j` (scored), `asg_j` (argmax assignment) per round `j`, probe
    * against the final `asg`.
    */
  /** CTE generator for the unrolled Lloyd rounds — the SQL mirror of
    * [[lloydAssignExact]], shared by [[ivfKmeansTopKSql]] and
    * [[semanticDedupSql]]. Callers must define `dims` and `norms`
    * CTEs; the final assignment (with its centroid-cosine `cs`) is
    * `asg_{iters-1}`.
    */
  private[operators] def lloydCtesSql(cells: Int, iters: Int,
      src: String = "embeddings"): String = {
    require(iters >= 1)
    (0 until iters).map { j =>
      val cent =
        if (j == 0)
          s"""cent_0 AS (
             |  SELECT vec_id AS cell, i AS ci, CAST(embedding[i] AS DOUBLE) AS mean
             |  FROM $src CROSS JOIN dims WHERE vec_id < $cells)"""
            .stripMargin
        else
          s"""cent_$j AS (
             |  SELECT a.cell, i AS ci,
             |    round(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(30,18)))
             |          AS DOUBLE) / COUNT(*), 6) AS mean
             |  FROM $src e
             |  JOIN asg_${j - 1} a ON e.vec_id = a.vec_id
             |  CROSS JOIN dims GROUP BY 1, 2)""".stripMargin
      s"""$cent,
         |cn_$j AS (
         |  SELECT cell, sqrt(CAST(SUM(CAST(mean * mean AS DECIMAL(30,18)))
         |         AS DOUBLE)) AS cnrm
         |  FROM cent_$j GROUP BY 1),
         |as_$j AS (
         |  SELECT t.vec_id, t.cell, round(t.dot / (n.nrm * cn.cnrm), 6) AS cs
         |  FROM (
         |    SELECT e.vec_id, c.cell,
         |      CAST(SUM(CAST(CAST(e.embedding[c.ci] AS DOUBLE) * c.mean
         |               AS DECIMAL(30,18))) AS DOUBLE) AS dot
         |    FROM $src e CROSS JOIN cent_$j c GROUP BY 1, 2) t
         |  JOIN norms n ON t.vec_id = n.vec_id
         |  JOIN cn_$j cn ON t.cell = cn.cell),
         |asg_$j AS (
         |  SELECT vec_id, cell, cs FROM (
         |    SELECT vec_id, cell, cs,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |    FROM as_$j) t WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
  }

  def ivfKmeansTopKSql(cells: Int = 8, iters: Int = 2, numQueries: Int = 10,
      k: Int = 5, dims: Int = 64): String = {
    val gens = lloydCtesSql(cells, iters)
    val last = s"asg_${iters - 1}"
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |$gens,
       |prod AS (
       |  SELECT q.vec_id AS qid, aq.cell, c.vec_id AS cid,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN $last aq ON q.vec_id = aq.vec_id AND q.vec_id < $numQueries
       |  JOIN $last ac ON ac.cell = aq.cell
       |  JOIN embeddings c ON c.vec_id = ac.vec_id AND c.vec_id <> q.vec_id
       |  CROSS JOIN dims
       |  GROUP BY 1, 2, 3),
       |cosd AS (
       |  SELECT qid, cell, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
       |  FROM prod
       |  JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON cid = nc.vec_id),
       |ranked AS (
       |  SELECT qid, cell, cid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
       |  FROM cosd)
       |SELECT qid, cell, cid, cosine, rk FROM ranked WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  /** Semantic dedup — the SemDeDup recipe (Abbas et al.,
    * arXiv:2303.09540) composed from the engine's own parts: k-means
    * the embedding corpus into `cells` ([[lloydAssignExact]] — exact-
    * decimal Lloyd, broadcast codebook), generate candidate pairs ONLY
    * within a cell, verify with the exact-decimal cosine ≥ `tau`, take
    * connected components of the verified pairs
    * ([[Dedup.connectedComponents]], large-star/small-star), and per
    * duplicate group keep the member with the LOWEST cosine to its
    * cell centroid (the paper's keep-farthest rule — it preserves
    * diversity; ties break to the lowest vec_id). Output is a total
    * map — one row per vector with its cell, centroid cosine, group
    * id/size and keep verdict, so `WHERE keep` is the training
    * keep-list and `WHERE NOT keep` the drop-list.
    *
    * Scale shape: the quadratic step is confined to within-cell
    * pairing, so cost scales with Σ occupancy², not corpus² — `cells`
    * is the occupancy knob a 100 TB run raises ∝ corpus (SemDeDup
    * used 50k cells). EXACT-duplicate embeddings — the degenerate
    * mega-cell mass a web corpus guarantees (boilerplate, empty docs)
    * — never reach the self-join: they collapse to a min-id
    * representative first (linear, semantics-preserving; see inline
    * note), the cell-level analogue of the LSH bucket-occupancy
    * guard. The codegen'd float cosine prefilter (margin
    * 0.01, provably lossless at round-6 precision — the
    * [[embeddingNearDups]] argument) discards non-candidates before
    * the interpreted decimal verify; the CC loop rides on the tiny
    * pair set, and the keep-farthest winner is a partial-aggregatable
    * `min_by` per group (no window — see inline note). Like
    * `dedup_clusters`, CONSTRUCTING this result runs the contraction
    * loop (driver-coordinated fixpoint — inherently eager).
    */
  def semanticDedup(embeddings: DataFrame, cells: Int = 8, iters: Int = 2,
      tau: Double = 0.4): DataFrame = {
    import graft.functions.VectorFunctions.{cosine_sim, decimal_dot}
    val asg = lloydAssignExact(embeddings, cells, iters)
    // collapse EXACT-duplicate embeddings before the quadratic stage —
    // the cell-level analogue of the LSH mega-bucket guard: identical
    // embeddings (web boilerplate / empty docs) all quantize to one
    // cell and alone would emit occupancy² pairs, yet they are
    // cosine-1 duplicates BY IDENTITY. Members link to their min-id
    // representative (one hash-agg + one join, linear); only distinct
    // vectors enter the self-join; verdicts expand afterwards.
    // Bit-identical output: members share the rep's cell/csim (the
    // argmax is a pure function of the embedding), the group label is
    // the min member id either way, and the keep rule's (csim, vec_id)
    // order elects the rep among its members exactly as pairwise
    // cosine-1 edges would.
    val reps = asg.groupBy("embedding").agg(
      min(col("vec_id")).as("vec_id"), first(col("nrm")).as("nrm"),
      first(col("cell")).as("cell"))
    // shuffle_hash: the static planner sees only unknown-stat RDD
    // inputs here, so without the hint it falls back to sort-merge
    // (AQE fixes it at runtime, but the plan guard — and a plain
    // .explain — should show the hash join we actually want)
    val mapped = asg.select(col("vec_id"), col("embedding"))
      .join(reps.select(col("embedding"), col("vec_id").as("rep"))
        .hint("shuffle_hash"), Seq("embedding"))
      .select(col("vec_id"), col("rep"))
    val side = reps.select(col("vec_id"), col("embedding"), col("nrm"),
      col("cell"))
    val edges = side.as("a")
      .join(side.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine_sim(col("a.embedding"), col("b.embedding")) >= tau - 0.01)
      .withColumn("cosine", round(
        decimal_dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cosine") >= tau)
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
    // connectedComponents lazily checkpoints this pipeline before its
    // canonicalization — the plan barrier that keeps the codegen'd
    // float prefilter ahead of the interpreted decimal verify
    // (Catalyst would otherwise reorder the pushed-down conjuncts:
    // measured 15 s vs 0.7 s at sf0.1 for the identical edge set)
    val grp = mapped
      .join(Dedup.connectedComponents(edges,
          reps.select(col("vec_id").as("node")))
        .select(col("node").as("rep"), col("lbl").as("group_id"))
        .hint("shuffle_hash"), Seq("rep"))
      .select(col("vec_id"), col("group_id"))
    // keep-farthest as a partial-aggregatable min_by over the
    // (centroid_sim, vec_id) struct — NOT a row_number window: a
    // window would shuffle every member of a duplicate group to one
    // reducer task (a giant group = one unsplittable straggler),
    // while the aggregate does map-side partials and AQE can split
    // the skew. Same (csim asc, vec_id asc) total order; group_size
    // rides the same aggregation. The joined frame is EAGERLY
    // checkpointed so its two references (winners agg + keep join)
    // share one materialization instead of racing to compute it twice
    // in one job — this result is construction-eager already (the CC
    // fixpoint above), so no new eagerness is introduced.
    val joined = asg
      .select(col("vec_id"), col("cell"), col("csim").as("centroid_sim"))
      .join(grp.hint("shuffle_hash"), "vec_id")
      .localCheckpoint()
    val winners = joined.groupBy("group_id").agg(
      count(lit(1)).as("group_size"),
      min_by(col("vec_id"),
        struct(col("centroid_sim"), col("vec_id"))).as("keep_vec"))
    joined.join(winners.hint("shuffle_hash"), "group_id")
      .withColumn("keep", col("vec_id") === col("keep_vec"))
      .select("vec_id", "cell", "centroid_sim", "group_id", "group_size",
        "keep")
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[semanticDedup]]: [[lloydCtesSql]] rounds, the
    * within-cell pair + exact cosine verify, a recursive-reach
    * components CTE (the [[Dedup.clustersSql]] pattern), and the
    * keep-farthest window.
    */
  def semanticDedupSql(cells: Int = 8, iters: Int = 2, tau: Double = 0.4,
      dims: Int = 64): String = {
    val gens = lloydCtesSql(cells, iters)
    val last = s"asg_${iters - 1}"
    s"""WITH RECURSIVE dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |$gens,
       |prod AS (
       |  SELECT a.vec_id AS d1, b.vec_id AS d2,
       |    CAST(SUM(CAST(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM $last a JOIN $last b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  CROSS JOIN dims GROUP BY 1, 2),
       |edges AS (
       |  SELECT d1, d2 FROM prod
       |  JOIN norms n1 ON d1 = n1.vec_id
       |  JOIN norms n2 ON d2 = n2.vec_id
       |  WHERE round(dot / (n1.nrm * n2.nrm), 6) >= $tau),
       |sym AS (SELECT d1 AS src, d2 AS dst FROM edges
       |        UNION ALL SELECT d2, d1 FROM edges),
       |reach(src, dst) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
       |lbl AS (SELECT src AS vec_id, MIN(dst) AS group_id
       |        FROM reach GROUP BY 1),
       |gsz AS (SELECT group_id, COUNT(*) AS group_size FROM lbl GROUP BY 1),
       |ranked AS (
       |  SELECT l.vec_id, a.cell, a.cs AS centroid_sim, l.group_id,
       |    g.group_size,
       |    ROW_NUMBER() OVER (PARTITION BY l.group_id
       |      ORDER BY a.cs ASC, l.vec_id ASC) AS rn
       |  FROM lbl l
       |  JOIN $last a ON a.vec_id = l.vec_id
       |  JOIN gsz g USING (group_id))
       |SELECT vec_id, cell, centroid_sim, group_id, group_size,
       |  rn = 1 AS keep
       |FROM ranked ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Persisted semantic index store + incremental semantic dedup
  // ---------------------------------------------------------------

  /** Persist the exact-decimal semantic index of a BASE corpus — the
    * trained Lloyd codebook (`codebook/`: cell, centroid) and the
    * assigned base vectors (`vectors/`: vec_id, embedding, nrm, cell,
    * csim) — so incremental batches dedup against an artifact instead
    * of re-running Lloyd + assignment over the whole base every
    * ingest (the [[graft.operators.Dedup.writeSignatureStore]]
    * pattern applied to the semantic family). Atomic temp+rename
    * publish: a crash mid-write never leaves a trustable-looking
    * partial index. Vectors are written FIRST — materializing the
    * assignment populates the per-round lazy checkpoints the codebook
    * plan then reads from.
    */
  def writeSemanticStore(base: DataFrame, path: String, cells: Int = 8,
      iters: Int = 2, hashSeeds: Boolean = false): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      base.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".inprogress")
    fs.delete(tmp, true)
    val (cb, asg) = lloydTrainExact(base, cells, iters, hashSeeds)
    // vectors are hive-partitioned BY CELL: an incremental batch joins
    // on cell with the (small) delta broadcast, so dynamic partition
    // pruning can skip every cell the batch doesn't touch — the layout
    // that matters when the base is 100 TB and a clustered delta hits
    // a handful of cells
    // one shuffle by cell before the write: each cell lands in ONE
    // task → one file per cell partition, instead of (write tasks ×
    // cells) small files whose listing overhead would dominate reads
    asg.repartition(col("cell"))
      .write.partitionBy("cell").parquet(tmp.toString + "/vectors")
    cb.write.parquet(tmp.toString + "/codebook")
    StoreSwap.swapIn(fs, tmp, dst)
  }

  /** Both halves present and complete (their own `_SUCCESS` markers) —
    * the completeness gate a reader must pass before trusting the
    * index.
    */
  def isCompleteSemanticStore(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(path + "/vectors/_SUCCESS")) &&
      fs.exists(new org.apache.hadoop.fs.Path(path + "/codebook/_SUCCESS"))

  /** Build-once helper for the driver entries — content-fingerprint
    * path keying + completeness gate, the
    * [[graft.operators.Dedup.ensureSignatureStore]] discipline: a
    * regenerated fixture or crashed partial is rebuilt, never
    * trusted. EAGER (runs the fingerprint count and possibly the
    * store build at construction) by documented design.
    */
  def ensureSemanticStore(base: DataFrame, tag: String, cells: Int = 8,
      iters: Int = 2): String = {
    // fingerprint folds an order-free CONTENT hash (xor of per-row
    // xxhash64 over id + embedding bytes) alongside (count, max id) so
    // a same-shape regenerated fixture never reuses a stale index
    // (r10, ADVICE — the ensureLmStore convention)
    val fp = StoreSwap.contentFp(base, "ensureSemanticStore", "vec_id",
      Seq("vec_id", "cast(embedding as string)"))
    val path = s"/tmp/graft_semstore_${tag}_${fp.tag}_c${cells}i${iters}p"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      base.sparkSession.sparkContext.hadoopConfiguration)
    if (!isCompleteSemanticStore(fs, path))
      writeSemanticStore(base, path, cells, iters)
    path
  }

  /** Incremental SemDeDup — a delta batch deduped against a PERSISTED
    * semantic index ([[writeSemanticStore]]): each delta vector is
    * assigned to its cell by the STORED codebook (the verbatim
    * [[assignToCodebook]] pass the base corpus went through), then
    * compared against the stored base vectors of that cell only —
    * codegen'd float cosine prefilter at `tau − 0.01`, exact-decimal
    * verify at `tau`, worst-match argmax as a partial-aggregatable
    * `max_by` (highest cosine, ties to the lowest base id). One
    * verdict row per delta vector, keeps included.
    *
    * Scale shape: per-ingest cost is |delta| × (cell occupancy), and
    * the base is READ, never recomputed — the semantic twin of
    * [[graft.operators.Dedup.incrementalLshStore]]'s "per-batch cost
    * independent of base size" property. The delta assignment is
    * EAGERLY checkpointed (two consumers — the hit aggregation and
    * the verdict join — must share one materialization; documented
    * per the r9 convention).
    */
  def semanticDedupIncremental(storePath: String, delta: DataFrame,
      tau: Double = 0.4, pruneCells: Boolean = true): DataFrame = {
    val cb = delta.sparkSession.read.parquet(s"$storePath/codebook")
    incrementalVerdicts(storePath,
      assignToCodebook(withNorm(delta), cb).localCheckpoint(), tau,
      pruneCells)
  }

  /** Verdicts for an ALREADY-ASSIGNED (and checkpointed) delta batch
    * — the shared core of [[semanticDedupIncremental]] and
    * [[appendToSemanticStore]], so the append path never assigns the
    * same batch twice.
    */
  private def incrementalVerdicts(storePath: String, asg: DataFrame,
      tau: Double, pruneCells: Boolean): DataFrame = {
    import graft.functions.VectorFunctions.{cosine_sim, decimal_dot}
    val spark = asg.sparkSession
    // the batch's TOUCHED CELLS are known once the (already eager)
    // assignment materializes — a ≤`cells`-row collect (dictionary-
    // sized, the BloomGate-sidecar class of driver artifact, not a
    // data collect) pushed back as a literal IN-filter on the
    // hive-partition column, so the scan below reads ONLY the store
    // partitions this batch can match. Spark's automatic DPP declines
    // this join (no selective build-side predicate), so the operator
    // supplies the pruning itself; `pruneCells = false` restores the
    // single lazy plan.
    val touched: Seq[Long] =
      if (pruneCells) asg.select("cell").distinct().collect()
        .map(_.getLong(0)).toSeq
      else Nil
    // the hive partition column reads back as INT — restore the
    // BIGINT the rest of the engine (and the oracle schema) carries
    val allVecs = spark.read.parquet(s"$storePath/vectors")
      .select(col("vec_id").as("bv"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm"), col("cell").cast("bigint").as("cell"))
    val baseVecs =
      if (touched.nonEmpty) allVecs.filter(col("cell").isin(touched: _*))
      else allVecs
    // the BASE side streams, the delta batch broadcasts: the store is
    // never shuffled, and cells no delta vector landed in are pruned
    // at the partition level before the scan
    val hits = baseVecs
      .join(broadcast(asg
        .select(col("vec_id"), col("embedding").as("d_emb"),
          col("nrm").as("d_nrm"), col("cell"))), Seq("cell"))
      .filter(cosine_sim(col("d_emb"), col("b_emb")) >= tau - 0.01)
      .withColumn("cosine", round(
        decimal_dot(col("d_emb"), col("b_emb")) /
          (col("d_nrm") * col("b_nrm")), 6))
      .filter(col("cosine") >= tau)
      .groupBy("vec_id")
      .agg(max("cosine").as("best_cosine"),
        max_by(col("bv"), struct(col("cosine"), (-col("bv")).as("nb")))
          .as("dup_of"))
    asg.join(hits.hint("shuffle_hash"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("csim"),
        col("best_cosine").isNotNull.as("is_dup"), col("dup_of"),
        col("best_cosine"))
      .orderBy("vec_id")
  }

  /** Fold a batch's KEPT vectors into the persisted semantic index:
    * the batch is gated against the CURRENT store (shared assignment
    * — assigned once), its keeps appended into their cell partitions.
    * Per-append cost ∝ batch, never the base; the codebook is NOT
    * retrained — cells stay frozen between periodic rebuilds
    * ([[rebuildSemanticStore]] — real code as of r10), exactly how a
    * production IVF index absorbs inserts (occupancy drift is the
    * signal to rebuild).
    * Spec-checked law: after appending batch₁, a later batch₂'s
    * verdicts equal dedup against base ∪ kept(batch₁) under the same
    * codebook — growth is visible to every later gate.
    */
  def appendToSemanticStore(storePath: String, batch: DataFrame,
      tau: Double = 0.4): Unit = {
    val spark = batch.sparkSession
    val cb = spark.read.parquet(s"$storePath/codebook")
    val asg = assignToCodebook(withNorm(batch), cb).localCheckpoint()
    val keeps = asg.join(
      incrementalVerdicts(storePath, asg, tau, pruneCells = true)
        .filter(!col("is_dup")).select("vec_id"), Seq("vec_id"))
      .select("vec_id", "embedding", "nrm", "cell", "csim")
    // staged append (r10): keeps are fully written into a staging dir
    // first, then MOVED file-by-file into the live cell partitions. A
    // crash mid-write can no longer leave a truncated parquet file in
    // the live tree (the pre-r10 `mode("append")` hazard — the store
    // kept passing isCompleteSemanticStore on the ORIGINAL _SUCCESS
    // markers while holding a corrupt tail); a crash mid-move leaves a
    // complete prefix of the batch's files — valid parquet, the
    // unmoved keeps are simply re-admitted by a later gate (duplicate
    // risk, not corruption), and [[rebuildSemanticStore]] over the
    // accumulated corpus is full recovery.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(storePath + "/.append_stage")
    fs.delete(stage, true)
    keeps.write.partitionBy("cell").parquet(stage.toString)
    val files = fs.listFiles(stage, true)
    while (files.hasNext) {
      val f = files.next().getPath
      if (f.getName.startsWith("part-")) {
        val destDir = new org.apache.hadoop.fs.Path(
          s"$storePath/vectors/${f.getParent.getName}")
        fs.mkdirs(destDir)
        require(fs.rename(f,
          new org.apache.hadoop.fs.Path(destDir, f.getName)),
          s"append move $f -> $destDir failed")
      }
    }
    fs.delete(stage, true)
  }

  /** Periodic codebook REBUILD — the closure of the append
    * discipline: [[appendToSemanticStore]] keeps cells frozen, so
    * many appends drift occupancy away from the trained balance; this
    * re-trains Lloyd on the FULL current vector set, re-assigns every
    * cell and atomically swap-publishes (the exact
    * [[writeSemanticStore]] semantics over the accumulated corpus —
    * rebuild ≡ fresh write over the same rows, spec-checked). The
    * current vectors are EAGERLY checkpointed before the destination
    * is touched (read-before-replace, the
    * [[graft.operators.Dedup.compactSignatureStore]] convention) so
    * no training job can observe a half-replaced store.
    *
    * Seeding: hash-spread by default (`hashSeeds = true` — see
    * [[lloydTrainExact]]): the rebuild exists to HEAL occupancy
    * drift, and lowest-id seeding would pin every centroid in the
    * oldest data region, leaving a newly-ingested dense region as one
    * overloaded cell no Lloyd round can split (measured: the seminc
    * drift rung's max/avg stays 5.8 under lowest-id reseeding,
    * rebalances under hash seeding).
    */
  def rebuildSemanticStore(spark: org.apache.spark.sql.SparkSession,
      path: String, cells: Int = 8, iters: Int = 2,
      hashSeeds: Boolean = true): Unit = {
    val cur = spark.read.parquet(s"$path/vectors")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    writeSemanticStore(cur, path, cells, iters, hashSeeds)
  }

  /** DuckDB oracle for [[semanticDedupIncremental]] with the driver's
    * base/delta split (base = lowest 4/5 of vec_ids — an exact
    * integer threshold both engines derive identically): Lloyd
    * generations over the BASE slice ([[lloydCtesSql]] with
    * `src = base`), one extra assignment CTE for the delta against
    * the final codebook, then the within-cell exact-cosine verify and
    * worst-match window.
    */
  def semanticDedupIncrementalSql(cells: Int = 8, iters: Int = 2,
      tau: Double = 0.4, dims: Int = 64): String = {
    val gens = lloydCtesSql(cells, iters, src = "base")
    val last = iters - 1
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |thr AS (SELECT (MAX(vec_id) * 4) // 5 AS t FROM embeddings),
       |base AS (SELECT e.* FROM embeddings e, thr WHERE e.vec_id < t),
       |delta AS (SELECT e.* FROM embeddings e, thr WHERE e.vec_id >= t),
       |$gens,
       |das AS (
       |  SELECT t.vec_id, t.cell, round(t.dot / (n.nrm * cn.cnrm), 6) AS cs
       |  FROM (
       |    SELECT e.vec_id, c.cell,
       |      CAST(SUM(CAST(CAST(e.embedding[c.ci] AS DOUBLE) * c.mean
       |               AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |    FROM delta e CROSS JOIN cent_$last c GROUP BY 1, 2) t
       |  JOIN norms n ON t.vec_id = n.vec_id
       |  JOIN cn_$last cn ON t.cell = cn.cell),
       |dassign AS (
       |  SELECT vec_id, cell, cs FROM (
       |    SELECT vec_id, cell, cs,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
       |    FROM das) t WHERE rn = 1),
       |prod AS (
       |  SELECT d.vec_id AS dv, b.vec_id AS bv,
       |    CAST(SUM(CAST(CAST(ed.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM dassign d JOIN asg_$last b ON d.cell = b.cell
       |  JOIN embeddings ed ON ed.vec_id = d.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  CROSS JOIN dims GROUP BY 1, 2),
       |hits AS (
       |  SELECT dv, bv, round(dot / (n1.nrm * n2.nrm), 6) AS cosine
       |  FROM prod
       |  JOIN norms n1 ON dv = n1.vec_id
       |  JOIN norms n2 ON bv = n2.vec_id
       |  WHERE round(dot / (n1.nrm * n2.nrm), 6) >= $tau),
       |best AS (
       |  SELECT dv, bv, cosine FROM (
       |    SELECT dv, bv, cosine,
       |      ROW_NUMBER() OVER (PARTITION BY dv
       |        ORDER BY cosine DESC, bv ASC) AS rn
       |    FROM hits) t WHERE rn = 1)
       |SELECT d.vec_id, d.cell, d.cs AS csim,
       |  b.bv IS NOT NULL AS is_dup, b.bv AS dup_of,
       |  b.cosine AS best_cosine
       |FROM dassign d LEFT JOIN best b ON d.vec_id = b.dv
       |ORDER BY d.vec_id""".stripMargin
  }

  /** Planted-cluster fixture transform (r10): derives a CLUSTERED
    * embedding set deterministically from the isotropic fixture so
    * the recall evaluations can FAIL. Vector i is rebuilt as
    * `seed(i % seeds) + eps·orig(i)` — `seeds` well-separated centers
    * (isotropic 64-dim seeds are near-orthogonal) with controlled
    * perturbation radius `eps`, so each vector's exact top-k is
    * dominated by its own planted cluster (at eps = 0.05 planted
    * cosines ≈ 0.999 vs ≈ 0 cross-cluster — far above JL/PQ
    * distortion, unlike the raw fixture whose neighbor gaps sit below
    * it; VERDICT r9 finding 3). `label` becomes the planted cluster
    * id, so the label-seeded IVF codebook aligns with the structure an
    * index is supposed to exploit. Measured (sf0.001/0.01, 10 queries,
    * 10 members/cluster): IVF recall@5 = 1.0 on every query (vs ~0.16
    * on the isotropic originals — the eval can now fail); PQ(m=16,
    * k=64 — the shipped `sim_pq_recall_clustered` config) min 0.6;
    * sign-RP min 0.4; SimilaritySpec floors 0.9 /
    * 0.5 / 0.3. Honest ceiling: once clusters hold ~40 members
    * (sf0.1) the WITHIN-cluster gaps (≈ eps·‖orig_i − orig_j‖ order
    * statistics over 40 draws) fall back below coarse-quantizer/
    * sign-bit resolution, so PQ/RP per-query recall degrades toward
    * ~0.3-0.5 there while IVF stays 1.0 — cluster MEMBERSHIP is what
    * coarse indexes resolve; fine intra-cluster ranking needs the
    * exact re-rank stage every production ANN system runs anyway. Same float arithmetic in both
    * engines (double add/mul, one cast back to float), so every
    * downstream decimal-exact twin stays bit-portable;
    * [[clusteredEmbSql]] is the oracle-side constructor.
    *
    * Scale shape: the seed table (≤`seeds` rows) broadcasts; the
    * rebuild is one map pass.
    */
  def clusteredEmbeddings(embeddings: DataFrame, seeds: Int = 50,
      eps: Double = 0.4): DataFrame = {
    val seedVecs = embeddings.filter(col("vec_id") < seeds)
      .select(col("vec_id").as("sid"), col("embedding").as("s_emb"))
    embeddings.withColumn("sid", pmod(col("vec_id"), lit(seeds.toLong)))
      .join(broadcast(seedVecs), "sid")
      .select(col("vec_id"),
        expr(s"""zip_with(s_emb, embedding,
           |  (s, e) -> CAST(CAST(s AS DOUBLE) +
           |    CAST($eps AS DOUBLE) * CAST(e AS DOUBLE) AS FLOAT))""".stripMargin)
          .as("embedding"),
        pmod(col("vec_id"), lit(seeds.toLong)).cast("int").as("label"))
  }

  /** Wraps a twin oracle so it reads the [[clusteredEmbeddings]]
    * fixture: prepends the clustered-construction CTEs and re-points
    * the inner query's `embeddings` references at them. The inner SQL
    * must start with `WITH ` (every twin oracle does).
    */
  def clusteredEmbSql(inner: String, seeds: Int = 50, eps: Double = 0.4,
      dims: Int = 64): String = {
    require(inner.startsWith("WITH "), "inner oracle must start with WITH")
    // whole-word re-point only: a substring hit inside a longer
    // identifier / literal / CTE name would be silently corrupted by
    // a blind replace, so guard that every occurrence is the bare
    // table reference before rewriting. Quoted occurrences (string
    // literals / quoted identifiers) are word-adjacent to the quote,
    // not to a \w char, so they need their own rejection — \b matches
    // at a quote boundary and the blind replace WOULD rewrite them
    require("""\wembeddings|embeddings\w""".r.findFirstIn(inner).isEmpty,
      "inner oracle contains a non-bare 'embeddings' occurrence; " +
        "clusteredEmbSql can only re-point whole-word table references")
    require("""['"`]\s*embeddings|embeddings\s*['"`]""".r
        .findFirstIn(inner).isEmpty,
      "inner oracle contains a quoted 'embeddings' occurrence; " +
        "clusteredEmbSql cannot distinguish it from a table reference")
    s"""WITH emb_seed AS (
       |  SELECT vec_id AS sid, embedding AS s_emb FROM embeddings
       |  WHERE vec_id < $seeds),
       |emb_clustered AS (
       |  SELECT e.vec_id,
       |    list_transform(range(1, ${dims + 1}),
       |      i -> CAST(CAST(s.s_emb[i] AS DOUBLE) +
       |        CAST($eps AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS FLOAT))
       |      AS embedding,
       |    CAST(e.vec_id % $seeds AS INTEGER) AS label
       |  FROM embeddings e JOIN emb_seed s ON e.vec_id % $seeds = s.sid),
       |""".stripMargin +
      """\bembeddings\b""".r.replaceAllIn(
        inner.stripPrefix("WITH "), "emb_clustered")
  }

  /** Per-label centroids of the embedding column — the IVF coarse
    * quantizer building block (and a typical training-data analysis:
    * class prototypes). Element-wise mean via posexplode + exact
    * decimal sums → deterministic.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg(Kernels.dsum(col("col")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean", col("s") / col("n"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
      .select(col("label"),
        expr("transform(pm, x -> x.mean)").as("centroid"))
      .orderBy("label")

  /** Driver-facing scalar form of [[labelCentroids]]: one row per
    * (label, dimension) with the exact-decimal mean — no array columns
    * (the driver's row-sorter can't hash arrays), and fully
    * oracle-checkable. Element sums go through `DECIMAL(30,18)` (same
    * carrier as the cosine dot product — arbitrary floats, not the
    * 6-decimal money columns `Kernels.dsum` assumes); the final
    * `round(mean, 6)` absorbs the 1-ulp decimal→double cast divergence.
    */
  def labelCentroidsFlat(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg(round(
        sum(col("col").cast("double").cast("decimal(30,18)")).cast("double")
          / count(lit(1)), 6).as("mean"))
      .select(col("label"), col("pos").cast("long").as("pos"), col("mean"))
      .orderBy("label", "pos")

  /** DuckDB oracle for [[labelCentroidsFlat]] (dims=64 fixture). */
  def labelCentroidsFlatSql(dims: Int = 64): String =
    s"""SELECT label, i - 1 AS pos,
       |  round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,18)))
       |        AS DOUBLE) / COUNT(*), 6) AS mean
       |FROM embeddings
       |CROSS JOIN (SELECT UNNEST(range(1, ${dims + 1})) AS i) dims
       |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin

  // ---------------------------------------------------------------
  // kNN label classification + accuracy (embedding-space eval)
  // ---------------------------------------------------------------

  /** k-nearest-neighbor label classification with per-label accuracy —
    * the standard embedding-quality probe a pipeline runs before
    * trusting a vector space for curation decisions: hold out the
    * first `numQueries` vectors, predict each one's label by majority
    * vote over its k nearest corpus neighbors (cosine, self excluded),
    * and report accuracy per true label. Majority ties break to the
    * SMALLEST label, neighbor-rank ties to the smallest vec_id — a
    * total order end to end.
    *
    * Scale shape: queries broadcast against the corpus (the brute
    * -force eval shape — sample-bounded by design, like
    * [[annRecall]]; the production retrieval path is the IVF/LSH
    * family); votes and the per-query argmax are partial-aggregatable
    * `max_by` aggregates, NEVER windows partitioned on the query id
    * (the r9 cluster-resolution rule).
    *
    * Cross-engine exactness: cosine rides the DECIMAL(30,18) dot with
    * round(…,6) ([[cosineTopK]]'s convention); votes and counts are
    * exact integers; accuracy is an unrounded exact-integer ratio.
    */
  def knnClassify(embeddings: DataFrame, numQueries: Int = 50,
      k: Int = 5): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val withN = withNorm(embeddings)
    val queries = withN.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("label").as("actual"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val corpus = withN.select(col("vec_id").as("cid"),
      col("label").as("nlabel"), col("embedding").as("c_emb"),
      col("nrm").as("c_nrm"))
    val top = broadcast(queries)
      .join(corpus.drop("nlabel"), col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions
          .decimal_dot(col("q_emb"), col("c_emb")) /
          (col("q_nrm") * col("c_nrm")), 6))
      .groupBy("qid", "actual")
      .agg(top_k_by_score(struct(col("cosine"), col("cid")), k).as("top"))
      .select(col("qid"), col("actual"), explode(col("top")).as("nb"))
      .select(col("qid"), col("actual"), col("nb.id").as("cid"))
    // label join-back: the top-k frame is numQueries·k rows —
    // broadcast it so the corpus side never shuffles
    val neighbors = broadcast(top)
      .join(corpus.select("cid", "nlabel"), "cid")
    val predicted = neighbors
      .groupBy("qid", "actual", "nlabel")
      .agg(count(lit(1)).as("votes"))
      .groupBy("qid", "actual")
      .agg(max_by(col("nlabel"),
        struct(col("votes"), (-col("nlabel")).as("neg"))).as("predicted"))
    predicted.groupBy(col("actual"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("predicted") === col("actual"), lit(1L))
          .otherwise(lit(0L))).as("n_correct"))
      .select(col("actual"), col("n_queries"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_queries"))
          .as("accuracy"))
      .orderBy("actual")
  }

  /** DuckDB oracle for [[knnClassify]] — same decimal-exact cosine and
    * vote/argmax semantics (the oracle side may use windows; the Spark
    * side deliberately does not).
    */
  def knnClassifySql(numQueries: Int = 50, k: Int = 5,
      dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |prod AS (
       |  SELECT q.vec_id AS qid, q.label AS actual,
       |    c.vec_id AS cid, c.label AS nlabel,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN embeddings c ON q.vec_id < $numQueries AND q.vec_id <> c.vec_id
       |  CROSS JOIN dims
       |  GROUP BY 1, 2, 3, 4),
       |ranked AS (
       |  SELECT qid, actual, nlabel,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, cid) AS rk
       |  FROM prod
       |  JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON cid = nc.vec_id),
       |votes AS (
       |  SELECT qid, actual, nlabel, COUNT(*) AS votes
       |  FROM ranked WHERE rk <= $k GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT qid, actual, nlabel AS predicted,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY votes DESC, nlabel) AS vrk
       |  FROM votes)
       |SELECT actual, COUNT(*) AS n_queries,
       |  CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_correct,
       |  CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*) AS accuracy
       |FROM pred WHERE vrk = 1
       |GROUP BY 1 ORDER BY actual""".stripMargin

  // ---------------------------------------------------------------
  // Semantic decontamination (embedding-space benchmark overlap)
  // ---------------------------------------------------------------

  /** Embedding-space decontamination — the semantic complement of the
    * n-gram `CorpusPipeline.decontaminate`: flag corpus vectors whose
    * cosine against ANY benchmark vector reaches `tau` (paraphrased
    * eval leakage that shares no n-grams). The benchmark is the
    * deterministic `vec_id % benchMod == 0` slice (standing in for a
    * held-out eval suite); output is one row per contaminated vector
    * with its worst benchmark match (ties → lowest bench id) — the
    * drop-list a pipeline subtracts before training.
    *
    * Scale shape: eval suites are MBs while corpora are TBs, so the
    * benchmark side BROADCASTS and the corpus never shuffles for the
    * probe; candidates die at a codegen'd float cosine prefilter
    * (τ − 0.01 margin — float/decimal agree to ~1e-9, so no
    * qualifying pair is lost, the [[embeddingNearDups]] argument) and
    * only survivors pay the exact-decimal verify; the per-vector
    * argmax is a partial-aggregatable `max_by`, never a window.
    */
  def semanticDecontaminate(embeddings: DataFrame, tau: Double = 0.4,
      benchMod: Int = 25): DataFrame = {
    val withN = withNorm(embeddings)
    val bench = withN.filter(pmod(col("vec_id"), lit(benchMod)) === 0)
      .select(col("vec_id").as("bid"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm"))
    val corpus = withN.filter(pmod(col("vec_id"), lit(benchMod)) =!= 0)
      .select(col("vec_id"), col("embedding"), col("nrm"))
    corpus.crossJoin(broadcast(bench))
      .filter(graft.functions.VectorFunctions
        .cosine_sim(col("embedding"), col("b_emb")) >= tau - 0.01)
      .withColumn("cosine",
        round(graft.functions.VectorFunctions
          .decimal_dot(col("embedding"), col("b_emb")) /
          (col("nrm") * col("b_nrm")), 6))
      .filter(col("cosine") >= tau)
      .groupBy("vec_id")
      .agg(max("cosine").as("cosine"),
        max_by(col("bid"), struct(col("cosine"), (-col("bid")).as("nb")))
          .as("bench_id"))
      .select(col("vec_id"), col("bench_id"), col("cosine"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[semanticDecontaminate]] (dims=64 fixture) —
    * exact-decimal cosine only (the Spark float prefilter is a
    * provably lossless margin).
    */
  def semanticDecontaminateSql(tau: Double = 0.4, benchMod: Int = 25,
      dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |cosd AS (
       |  SELECT c.vec_id, b.vec_id AS bid,
       |    round(CAST(SUM(CAST(CAST(c.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)
       |      / (nc.nrm * nb.nrm), 6) AS cosine
       |  FROM embeddings c
       |  JOIN embeddings b
       |    ON c.vec_id % $benchMod <> 0 AND b.vec_id % $benchMod = 0
       |  CROSS JOIN dims
       |  JOIN norms nc ON c.vec_id = nc.vec_id
       |  JOIN norms nb ON b.vec_id = nb.vec_id
       |  GROUP BY 1, 2, nc.nrm, nb.nrm),
       |hits AS (
       |  SELECT vec_id, bid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cosine DESC, bid) AS rk
       |  FROM cosd WHERE cosine >= $tau)
       |SELECT vec_id, bid AS bench_id, cosine
       |FROM hits WHERE rk = 1
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------
  // Hard-negative mining (contrastive-training pair construction)
  // ---------------------------------------------------------------

  /** HARD-NEGATIVE mining — for each query vector, the k most
    * cosine-similar corpus vectors carrying a DIFFERENT label: the
    * near-miss pairs contrastive/embedding training runs on (easy
    * random negatives teach nothing; the highest-similarity wrong-
    * label neighbors carry the gradient — the standard dense-retrieval
    * recipe, e.g. Xiong et al. ANCE, arXiv:2007.00808). Same
    * decimal-exact scored-pair + bounded-heap shape as
    * [[cosineTopKAgg]] with the wrong-label predicate in the join;
    * the negative labels come back via a broadcast of the k·queries
    * result rows against the label table — the corpus never shuffles.
    */
  def hardNegatives(embeddings: DataFrame, numQueries: Int = 10,
      k: Int = 5): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    import graft.functions.VectorFunctions.decimal_dot
    val withN = withNorm(embeddings)
    val queries = withN.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val corpus = withN.select(col("vec_id").as("cid"),
      col("label").as("c_label"), col("embedding").as("c_emb"),
      col("nrm").as("c_nrm"))
    val top = broadcast(queries)
      .join(corpus,
        col("qid") =!= col("cid") && col("q_label") =!= col("c_label"))
      .withColumn("cosine",
        round(decimal_dot(col("q_emb"), col("c_emb")) /
          (col("q_nrm") * col("c_nrm")), 6))
      .groupBy("qid", "q_label")
      .agg(top_k_by_score(struct(col("cosine"), col("cid")), k).as("top"))
      .select(col("qid"), col("q_label"), posexplode(col("top")))
      .select(col("qid"), col("q_label"), col("col.id").as("cid"),
        col("col.score").as("cosine"), (col("pos") + 1).as("rk"))
    embeddings.select(col("vec_id").as("cid"), col("label").as("c_label"))
      .join(broadcast(top), Seq("cid"))
      .select("qid", "q_label", "cid", "c_label", "cosine", "rk")
      .orderBy("qid", "rk")
  }

  def hardNegativesSql(numQueries: Int = 10, k: Int = 5,
      dims: Int = 64): String =
    s"""WITH dims AS (SELECT UNNEST(range(1, ${dims + 1})) AS i),
       |norms AS (
       |  SELECT vec_id,
       |    sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE)) AS nrm
       |  FROM embeddings CROSS JOIN dims GROUP BY 1),
       |prod AS (
       |  SELECT q.vec_id AS qid, q.label AS q_label,
       |    c.vec_id AS cid, c.label AS c_label,
       |    CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
       |             AS DECIMAL(30,18))) AS DOUBLE) AS dot
       |  FROM embeddings q
       |  JOIN embeddings c
       |    ON q.vec_id < $numQueries AND q.vec_id <> c.vec_id
       |    AND q.label <> c.label
       |  CROSS JOIN dims
       |  GROUP BY 1, 2, 3, 4),
       |cosd AS (
       |  SELECT qid, q_label, cid, c_label,
       |    round(dot / (nq.nrm * nc.nrm), 6) AS cosine
       |  FROM prod
       |  JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON cid = nc.vec_id),
       |ranked AS (
       |  SELECT qid, q_label, cid, c_label, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS rk
       |  FROM cosd)
       |SELECT qid, q_label, cid, c_label, cosine, rk
       |FROM ranked WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------
  // Sign random projection (Johnson–Lindenstrauss dimensionality cut)
  // ---------------------------------------------------------------

  /** Sign random projection — the Johnson–Lindenstrauss dimensionality
    * reduction with the ±1 matrix of Achlioptas (JCSS 2003): each
    * output coordinate is `Σ_j s(i,j)·v_j` with `s(i,j) ∈ {+1,−1}`
    * derived from the portable 60-bit md5 of `(i, j)` — no RNG state,
    * the same matrix on every executor of any cluster, and the same
    * matrix in the DuckDB oracle. Cosines in the projected space
    * approximate originals within the JL distortion bound, at
    * `outDims/dims` of the downstream cost — THE standard pre-ANN cut
    * for wide (768–4096-dim) production embeddings.
    *
    * Plan shape: the sign matrix is assembled once from a
    * `spark.range(outDims·dims)` — dictionary-side work, aggregated to
    * ONE literal-sized row and broadcast — and the corpus maps through
    * a fused `transform ∘ aggregate ∘ zip_with` chain: a pure,
    * shuffle-free projection pass at any corpus size.
    *
    * Exactness: per-element ±v products are float32 values (exact in
    * DECIMAL(30,18)); each output coordinate's in-row fold rides the
    * decimal carrier, is cast to double once, then SNAPS to a 1e6
    * BIGINT grid — from there every downstream dot/norm is exact
    * integer arithmetic, order-free and bit-identical cross-engine
    * (the Quantize pattern). Overflow bound: |p| ≤ dims·max|v|·1e6
    * must stay ≤ ~3e9 so Σ p² over outDims fits a BIGINT — holds to
    * ~47·dims·max|v| at outDims=16, loose by orders of magnitude for
    * unit-normalized embeddings.
    */
  def randomProject(embeddings: DataFrame, outDims: Int = 32,
      dims: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    val signExpr =
      s"""1 - 2 * (cast(conv(substring(md5(concat('rp:',
         |  cast(id div $dims as string), ':',
         |  cast(id % $dims as string))), 1, 15), 16, 10) as bigint) % 2)"""
        .stripMargin
    val matrix = spark.range(outDims.toLong * dims)
      .select(expr(s"id div $dims").as("i"), expr(s"id % $dims").as("j"),
        expr(signExpr).as("s"))
      .groupBy("i")
      .agg(expr("transform(sort_array(collect_list(struct(j, s))), x -> x.s)")
        .as("srow"))
      .agg(expr("transform(sort_array(collect_list(struct(i, srow))), x -> x.srow)")
        .as("sm"))
    embeddings.crossJoin(broadcast(matrix))
      // decimal_sign_dot = the compiled kernel form of the former
      // interpreted `aggregate(zip_with(... DECIMAL(30,18)))` fold —
      // same per-product shortest-decimal scale-18 HALF_UP rounding
      // and exact sum (bit-identical; spec-pinned), ~interpreter-free
      // on the outDims·dims hot loop (r18)
      .withColumn("proj", expr(
        """transform(sm, srow ->
          |  cast(floor(decimal_sign_dot(srow, embedding) * 1e6
          |    + 0.5) as bigint))""".stripMargin))
      .select("vec_id", "label", "proj")
  }

  /** Top-k cosine search in the PROJECTED space — [[cosineTopKAgg]]'s
    * bounded-heap shape over [[randomProject]] vectors. Because the
    * projected coordinates are exact BIGINTs, dot products and squared
    * norms are exact integer sums and the cosine is a single division
    * of exact operands — emitted UNROUNDED (identical IEEE ops in
    * DuckDB; the integer-ratio house rule). Zero-norm projections
    * score −2.0 so they sort after every real cosine deterministically.
    */
  def rpTopK(embeddings: DataFrame, outDims: Int = 32, dims: Int = 64,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val p = randomProject(embeddings, outDims, dims)
      .withColumn("n2",
        expr("aggregate(proj, cast(0 as bigint), (acc, x) -> acc + x * x)"))
    val queries = p.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("proj").as("q_proj"),
        col("n2").as("q_n2"))
    val corpus = p.select(col("vec_id").as("cid"), col("proj").as("c_proj"),
      col("n2").as("c_n2"))
    broadcast(queries)
      .join(corpus, col("qid") =!= col("cid"))
      .withColumn("dot", expr(
        "aggregate(zip_with(q_proj, c_proj, (a, b) -> a * b), " +
          "cast(0 as bigint), (acc, x) -> acc + x)"))
      .withColumn("pcos",
        when(col("q_n2") === 0 || col("c_n2") === 0, lit(-2.0))
          .otherwise(col("dot").cast("double") /
            (sqrt(col("q_n2").cast("double")) *
              sqrt(col("c_n2").cast("double")))))
      .groupBy("qid")
      .agg(top_k_by_score(struct(col("pcos"), col("cid")), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as("pcos"), (col("pos") + 1).as("rk"))
      .orderBy("qid", "rk")
  }

  def rpTopKSql(outDims: Int = 32, dims: Int = 64, numQueries: Int = 10,
      k: Int = 5): String =
    s"""WITH signs AS (
       |  SELECT i, j,
       |    1 - 2 * (CAST('0x' || substring(md5('rp:' || i || ':' || j),
       |      1, 15) AS BIGINT) % 2) AS s
       |  FROM (SELECT UNNEST(range(0, $outDims)) AS i)
       |  CROSS JOIN (SELECT UNNEST(range(0, $dims)) AS j)),
       |proj AS (
       |  SELECT vec_id, i,
       |    CAST(floor(CAST(SUM(CAST(s * CAST(embedding[j + 1] AS DOUBLE)
       |      AS DECIMAL(30,18))) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS p
       |  FROM embeddings CROSS JOIN signs GROUP BY 1, 2),
       |n2 AS (SELECT vec_id, CAST(SUM(p * p) AS BIGINT) AS n2
       |       FROM proj GROUP BY 1),
       |dots AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(SUM(q.p * c.p) AS BIGINT) AS dot
       |  FROM proj q JOIN proj c
       |    ON q.i = c.i AND q.vec_id < $numQueries AND q.vec_id <> c.vec_id
       |  GROUP BY 1, 2),
       |cosd AS (
       |  SELECT qid, cid,
       |    CASE WHEN nq.n2 = 0 OR nc.n2 = 0 THEN -2.0
       |         ELSE CAST(dot AS DOUBLE)
       |           / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
       |    END AS pcos
       |  FROM dots JOIN n2 nq ON qid = nq.vec_id
       |  JOIN n2 nc ON cid = nc.vec_id),
       |ranked AS (
       |  SELECT qid, cid, pcos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY pcos DESC, cid) AS rk
       |  FROM cosd)
       |SELECT qid, cid, pcos, rk FROM ranked WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin

  /** Recall@k of the projected-space top-k against the full-dimension
    * exact top-k — the measurement that justifies an `outDims` choice
    * before a corpus-scale ANN build, itself bit-reproducible
    * cross-engine (the [[annRecall]] pattern: both sides' oracles
    * compose as CTEs).
    *
    * Honest fixture note: the synthetic embeddings are isotropic
    * random vectors, so exact top-k neighbors are separated by cosine
    * gaps (~1e-2) far BELOW the JL distortion at any useful `outDims`
    * — measured recall is ~0.16 at 32 dims and only 0.28 even at a
    * full-width 64-dim sign projection. That is the measurement
    * working correctly: it reports that this data has no low-dim
    * structure to preserve. Clustered real-world embeddings, whose
    * neighbor gaps are 10–100× the distortion, are the case the
    * transform exists for.
    */
  def rpRecall(embeddings: DataFrame, outDims: Int = 32, dims: Int = 64,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    val exact = cosineTopKAgg(embeddings, numQueries, k)
      .select(col("qid"), col("cid"))
    val approx = rpTopK(embeddings, outDims, dims, numQueries, k)
      .select(col("qid"), col("cid"), lit(1L).as("hit"))
    exact.join(broadcast(approx), Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_at_k",
        col("n_hits").cast("double") / col("k").cast("double"))
      .orderBy("qid")
  }

  def rpRecallSql(outDims: Int = 32, dims: Int = 64, numQueries: Int = 10,
      k: Int = 5): String =
    s"""WITH exact AS (
       |${cosineTopKSql(numQueries, k, dims)}
       |), approx AS (
       |${rpTopKSql(outDims, dims, numQueries, k)}
       |)
       |SELECT e.qid, COUNT(*) AS k,
       |  CAST(COALESCE(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS n_hits,
       |  CAST(COALESCE(SUM(CASE WHEN a.cid IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / COUNT(*) AS recall_at_k
       |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
