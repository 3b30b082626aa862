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

  /** M4 proper: compressed (randomized) SVD of a SQUARE distributed
    * matrix — the reference's `da.linalg.svd_compressed(x, k=5)` over
    * 16k×16k with 4k chunks (`svd_square_matrix.py:18-29`), where the
    * tall-skinny Gram path does not apply. Halko range-finder scheme:
    *
    *   1. Y = A·Ω with a seeded local n×l test matrix (l = k +
    *      oversample) — one distributed pass, NO shuffle (Ω rides the
    *      closure);
    *   2. optional power iterations Y ← A·(Aᵀ·Y) to sharpen the
    *      spectrum (two block matmuls each — the only shuffles here);
    *   3. orthonormalize Y via its l×l Gram (eigendecomposition on
    *      the driver — l² is tiny by construction), Q = Y·(V·Σ^-½);
    *   4. project: Bᵀ = Aᵀ·Q (n×l, collected — MBs), local SVD of Bᵀ,
    *      then U = Q·Z distributed.
    *
    * Everything distributed is a matmul; everything local is O(n·l) —
    * exactly the compute/communication split dask's task graph builds
    * for `svd_compressed`.
    */
  def svdCompressed(a: BlockMatrix, k: Int, oversample: Int = 5,
      powerIters: Int = 1, seed: Long = 42L)
      : (IndexedRowMatrix, Array[Double], DenseMatrix) = {
    import breeze.linalg.{eigSym, svd => bsvd, DenseMatrix => BDM}
    val n = a.numCols().toInt
    val l = math.min(k + oversample, n)
    // seeded splitmix64 test matrix (column-major), deterministic
    val omega = new DenseMatrix(n, l, Array.tabulate(n * l) { t =>
      var z = seed + t * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
    })
    val ari = a.toIndexedRowMatrix()
    val at = a.transpose
    var y = ari.multiply(omega)
    for (_ <- 0 until powerIters) {
      // inner block dims must agree: Aᵀ's colsPerBlock = A's rowsPerBlock
      val z = at.multiply(y.toBlockMatrix(a.rowsPerBlock, l))
      y = a.multiply(z).toIndexedRowMatrix()
    }
    // Gram-based orthonormalization (l×l on the driver)
    val g = y.toRowMatrix().computeGramianMatrix()
    val gb = new BDM(l, l, g.toArray)
    val es = eigSym(gb)
    // keep numerically nonzero directions (rank-deficient inputs).
    // eigSym can return slightly NEGATIVE eigenvalues for a PSD Gram,
    // and an all-zero input makes every eigenvalue ~0. Degeneracy is
    // judged SCALE-RELATIVELY: a non-positive spectrum maximum fails
    // loudly (the only genuinely rank-0 case), and the keep-cut is
    // relative to that maximum — so a well-conditioned matrix of tiny
    // magnitude (entries ~1e-8, Gram eigenvalues ~1e-15) still
    // decomposes, while nothing negative can ever reach 1/sqrt (the
    // threshold is strictly positive).
    val lambdaMax = es.eigenvalues.data.max
    require(lambdaMax > 0.0,
      s"svdCompressed: numerically zero range (max Gram eigenvalue " +
        s"$lambdaMax) — input has no detectable spectrum")
    val thresh = 1e-10 * lambdaMax
    val keep = (0 until l).filter(i => es.eigenvalues(i) > thresh)
      .reverse // descending
    val scale = BDM.zeros[Double](l, keep.size)
    keep.zipWithIndex.foreach { case (src, dst) =>
      val inv = 1.0 / math.sqrt(es.eigenvalues(src))
      (0 until l).foreach(r => scale(r, dst) = es.eigenvectors(r, src) * inv)
    }
    val q = y.multiply(new DenseMatrix(l, keep.size, scale.data))
    // Bᵀ = Aᵀ·Q — n×l', collected local (MBs); SVD locally
    val bt = at.multiply(q.toBlockMatrix(a.rowsPerBlock, keep.size))
      .toLocalMatrix()
    val btB = new BDM(bt.numRows, bt.numCols, bt.toArray)
    val s = bsvd.reduced(btB)
    val kk = math.min(k, s.singularValues.length)
    // B = Z Σ Wᵀ with W = s.U, Z = s.Vt.T → A ≈ (Q·Z) Σ Wᵀ
    val zB = s.Vt.t.toDenseMatrix
    val zLocal = new DenseMatrix(zB.rows, kk,
      zB(::, 0 until kk).toDenseMatrix.data)
    val u = q.multiply(zLocal)
    val v = new DenseMatrix(n, kk,
      s.U(::, 0 until kk).toDenseMatrix.data)
    (u, s.singularValues.data.take(kk), v)
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
