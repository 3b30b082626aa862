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
}
