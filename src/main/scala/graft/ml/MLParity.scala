package graft.ml

import org.apache.spark.mllib.linalg.{DenseMatrix, Matrix, Vectors}
import org.apache.spark.mllib.linalg.distributed.{BlockMatrix, IndexedRow, IndexedRowMatrix, RowMatrix}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.ml.classification.{LinearSVC, LinearSVCModel}
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame

/** Array / linear-algebra / ML parity (SURVEY §2.12, M1-M7) for the
  * reference's dask.array & dask_ml benchmarks:
  *
  *  - M1 random chunked matrices — `benchmark/matrix_multiplication.py:25-26`
  *    (`da.random.random((mx,mx), chunks=(cx,cx))`)
  *  - M2 `da.matmul` — `matrix_multiplication.py:27` → `BlockMatrix.multiply`
  *  - M3 tall-skinny SVD — `svd_tall_skinny_matrix.py:25` → `RowMatrix.computeSVD`
  *  - M4 compressed/randomized SVD — `svd_square_matrix.py:24` → truncated
  *    `computeSVD(k)`
  *  - M5 pairwise tree reduction — `tree_reduction.py:25-26` → `rdd.treeReduce`
  *  - M6 k-means — `kmeans.py:22-29` → `ml.KMeans` (k-means|| init, the same
  *    oversampling family as dask_ml's `init_max_iter` scheme)
  *  - M7 parallel model inference (`parallelizing_svm.py:32-40`
  *    `ParallelPostFit(SVC).predict`) → broadcast model + partition-local
  *    scoring
  *
  * Chunked dask arrays map to block-partitioned distributed matrices:
  * dask `chunks=(c,c)` ≡ `BlockMatrix` `rowsPerBlock`/`colsPerBlock`.
  * Determinism: generators are seeded per-partition (hash of indices),
  * so results don't depend on task scheduling — the same property dask
  * gets from its content-hashed task keys.
  */
object MLParity {

  /** M1: seeded uniform random block matrix (values in [0,1)). The
    * generator is a per-cell splitmix64 of (seed, i, j) — task-order
    * independent, any partitioning yields the same matrix.
    */
  def randomMatrix(spark: SparkSession, rows: Long, cols: Int,
      rowsPerBlock: Int = 1024, seed: Long = 42L): IndexedRowMatrix = {
    val rdd: RDD[IndexedRow] = spark.sparkContext
      .range(0L, rows, numSlices = math.max(1, (rows / rowsPerBlock).toInt))
      .map { i =>
        val vals = Array.tabulate(cols) { j =>
          var z = seed + i * 0x9E3779B97F4A7C15L + j * 0xC2B2AE3D27D4EB4FL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
        }
        IndexedRow(i, Vectors.dense(vals))
      }
    new IndexedRowMatrix(rdd, rows, cols)
  }

  /** M1 (block form): seeded random BlockMatrix generated chunk-at-a-
    * time — the direct analogue of `da.random.random(..., chunks=(c,c))`
    * (`matrix_multiplication.py:25-26`), which also materializes chunks
    * directly rather than regrouping rows. Each block is seeded by its
    * (i, j) coordinates → partitioning/task-order independent.
    */
  def randomBlockMatrix(spark: SparkSession, n: Int, blockSize: Int,
      seed: Long = 42L): BlockMatrix = {
    val nBlocks = (n + blockSize - 1) / blockSize
    val coords = for (i <- 0 until nBlocks; j <- 0 until nBlocks) yield (i, j)
    val blocks = spark.sparkContext
      .parallelize(coords, math.min(coords.size, 64))
      .map { case (bi, bj) =>
        val rows = math.min(blockSize, n - bi * blockSize)
        val cols = math.min(blockSize, n - bj * blockSize)
        val vals = new Array[Double](rows * cols)
        var t = 0
        while (t < vals.length) {
          var z = seed + bi * 0x9E3779B97F4A7C15L +
            bj * 0xC2B2AE3D27D4EB4FL + t * 0xD6E8FEB86659FD93L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          vals(t) = ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
          t += 1
        }
        ((bi, bj), new DenseMatrix(rows, cols, vals): Matrix)
      }
    new BlockMatrix(blocks, blockSize, blockSize, n.toLong, n.toLong)
  }

  /** M2: distributed matrix multiply via block partitioning — tiles
    * shuffle by (i,k)/(k,j) and tile products reduce per (i,j), the
    * same dataflow dask builds as a task graph (`da.matmul`,
    * `matrix_multiplication.py:27`).
    */
  def matmul(a: IndexedRowMatrix, b: IndexedRowMatrix,
      blockSize: Int = 1024): BlockMatrix = {
    val ab = a.toBlockMatrix(blockSize, blockSize)
    val bb = b.toBlockMatrix(blockSize, blockSize)
    ab.multiply(bb)
  }

  /** M3/M4: (truncated) SVD of a tall-skinny matrix. RowMatrix uses
    * the Gram-matrix / ARPACK path — the same
    * QR-on-tall-skinny-blocks regime as `da.linalg.svd`.
    */
  def svd(m: RowMatrix, k: Int): (RowMatrix, Array[Double], Matrix) = {
    val s = m.computeSVD(k, computeU = true)
    (s.U, s.s.toArray, s.V)
  }

  /** M5: pairwise tree reduction (`delayed(add)` pairs in the
    * reference) — `treeReduce` builds the same log-depth combine tree.
    */
  def treeReduce(spark: SparkSession, values: Seq[Double], depth: Int = 3): Double =
    spark.sparkContext.parallelize(values, math.min(8, math.max(1, values.size / 2)))
      .treeReduce(_ + _, depth)

  /** M6: k-means with k-means|| initialization. */
  def kmeans(df: DataFrame, k: Int, seed: Long = 42L,
      featuresCol: String = "features"): KMeansModel =
    new KMeans().setK(k).setSeed(seed).setFeaturesCol(featuresCol).fit(df)

  /** M7: parallel inference of a driver-fit model — broadcast the
    * model once, score partition-locally (dask's `ParallelPostFit`).
    */
  def parallelPredict(df: DataFrame, model: KMeansModel): DataFrame =
    model.transform(df)

  /** M7, faithful to the reference's classifier
    * (`parallelizing_svm.py:32-40`: `ParallelPostFit(SVC)` fit on a
    * 1k-sample binary `make_classification` set, predicted over 100M
    * rows): `ml.classification.LinearSVC` is the 1:1 Spark analogue —
    * fit once on a small labeled set, then `transform` scores each
    * partition against the broadcast coefficients with no shuffle.
    */
  def fitSvc(train: DataFrame, maxIter: Int = 20,
      regParam: Double = 0.01): LinearSVCModel =
    new LinearSVC().setMaxIter(maxIter).setRegParam(regParam).fit(train)

  /** Broadcast-score the SVC model — dask's `ParallelPostFit.predict`. */
  def parallelPredictSvc(df: DataFrame, model: LinearSVCModel): DataFrame =
    model.transform(df)

  /** Embeddings fixture → ml features DataFrame. */
  def embeddingFeatures(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.functions._
    embeddings.select(col("vec_id"), col("label"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
  }
}
