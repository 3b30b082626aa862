package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.{IndexedRow, IndexedRowMatrix, RowMatrix}
import graft.ml.MLParity

class MLParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("randomMatrix is deterministic and partitioning-independent") {
    val a = MLParity.randomMatrix(spark, 8, 4, rowsPerBlock = 2)
      .rows.collect().sortBy(_.index).map(_.vector.toArray.toSeq)
    val b = MLParity.randomMatrix(spark, 8, 4, rowsPerBlock = 8)
      .rows.collect().sortBy(_.index).map(_.vector.toArray.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.flatten.forall(v => v >= 0.0 && v < 1.0))
  }

  test("randomBlockMatrix blocks are deterministic and well-shaped") {
    val m = MLParity.randomBlockMatrix(spark, 100, 30)
    assert(m.numRows() == 100 && m.numCols() == 100)
    assert(m.blocks.count() == 16) // 4x4 grid (30,30,30,10)
    val again = MLParity.randomBlockMatrix(spark, 100, 30)
    assert(m.toLocalMatrix().toArray.toSeq ==
      again.toLocalMatrix().toArray.toSeq)
  }

  test("block matmul against identity preserves the matrix") {
    val a = MLParity.randomBlockMatrix(spark, 64, 16)
    val idBlocks = spark.sparkContext
      .parallelize(for (i <- 0 until 4) yield (i, i))
      .map { case (i, j) =>
        ((i, j), org.apache.spark.mllib.linalg.DenseMatrix.eye(16):
          org.apache.spark.mllib.linalg.Matrix)
      }
    val id = new org.apache.spark.mllib.linalg.distributed.BlockMatrix(
      idBlocks, 16, 16, 64, 64)
    val prod = a.multiply(id).toLocalMatrix()
    assert(prod.toArray.toSeq == a.toLocalMatrix().toArray.toSeq)
  }

  test("matmul multiplies correctly (vs identity and small product)") {
    val m = new IndexedRowMatrix(spark.sparkContext.parallelize(Seq(
      IndexedRow(0, Vectors.dense(1.0, 2.0)),
      IndexedRow(1, Vectors.dense(3.0, 4.0)))))
    val id = new IndexedRowMatrix(spark.sparkContext.parallelize(Seq(
      IndexedRow(0, Vectors.dense(1.0, 0.0)),
      IndexedRow(1, Vectors.dense(0.0, 1.0)))))
    val prod = MLParity.matmul(m, id, blockSize = 2).toLocalMatrix()
    assert(prod(0, 0) == 1.0 && prod(0, 1) == 2.0 &&
      prod(1, 0) == 3.0 && prod(1, 1) == 4.0)
  }

  test("svd recovers singular values of a diagonal matrix") {
    val m = new RowMatrix(spark.sparkContext.parallelize(Seq(
      Vectors.dense(3.0, 0.0), Vectors.dense(0.0, 2.0))))
    val (_, s, _) = MLParity.svd(m, 2)
    assert(math.abs(s(0) - 3.0) < 1e-9 && math.abs(s(1) - 2.0) < 1e-9)
  }

  test("treeReduce sums pairwise like the reference tree reduction") {
    assert(MLParity.treeReduce(spark, (1 to 100).map(_.toDouble)) == 5050.0)
  }

  test("kmeans separates well-separated blobs") {
    val pts = (Seq.fill(20)((0.0, 0.0)) ++ Seq.fill(20)((10.0, 10.0)))
      .zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, Array(x + 0.01 * (i % 5), y + 0.01 * (i % 3)))
      }
    val df = pts.toDF("id", "arr")
      .selectExpr("id", "arr as embedding", "0 as label")
    val feats = MLParity.embeddingFeatures(
      df.selectExpr("id as vec_id", "cast(embedding as array<float>) as embedding", "label"))
    val model = MLParity.kmeans(feats, k = 2)
    val pred = MLParity.parallelPredict(feats, model)
    val counts = pred.groupBy("prediction").count()
      .collect().map(_.getLong(1)).sorted
    assert(counts.toSeq == Seq(20L, 20L))
  }

  test("LinearSVC parallel inference (M7): fit small, broadcast-score, no shuffle") {
    import org.apache.spark.sql.functions._
    // the reference's shape (parallelizing_svm.py:32-40): fit a binary
    // classifier on a small sample, predict over the big set
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val feats = MLParity.embeddingFeatures(emb)
      .withColumn("binlabel", (col("label") < 5).cast("double"))
    val model = MLParity.fitSvc(
      feats.select(col("features"), col("binlabel").as("label")))
    val pred = MLParity.parallelPredictSvc(feats, model)
    assert(pred.columns.contains("prediction"))
    val acc = pred
      .agg(avg((col("prediction") === col("binlabel")).cast("double")))
      .head.getDouble(0)
    assert(acc > 0.55, s"SVC accuracy on fixture labels: $acc")
    // scoring is partition-local: the transform adds no exchange
    assert(!pred.queryExecution.executedPlan.toString.contains("Exchange"),
      pred.queryExecution.executedPlan.toString)
  }

  test("LinearSVC recovers a linearly separable rule near-perfectly") {
    // make_classification-style separable data, deterministic
    val rows = (0 until 400).map { i =>
      val x0 = ((i * 2654435761L % 1000) / 1000.0) - 0.5
      val x1 = ((i * 40503L % 1000) / 1000.0) - 0.5
      val label = if (x0 + 2 * x1 > 0) 1.0 else 0.0
      (i.toLong, Array(x0.toFloat, x1.toFloat), label.toInt)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val feats = MLParity.embeddingFeatures(df)
      .selectExpr("features", "cast(label as double) as label")
    val model = MLParity.fitSvc(feats, maxIter = 50, regParam = 0.001)
    val pred = MLParity.parallelPredictSvc(feats, model)
    val acc = pred
      .agg(org.apache.spark.sql.functions.avg(
        (org.apache.spark.sql.functions.col("prediction") ===
          org.apache.spark.sql.functions.col("label")).cast("double")))
      .head.getDouble(0)
    assert(acc > 0.97, s"separable accuracy: $acc")
  }

  test("svdCompressed recovers a low-rank square matrix exactly") {
    // A = L·R with rank 3: the range finder captures the full range,
    // so the randomized SVD is exact up to float error
    val l3 = MLParity.randomMatrix(spark, 120L, 3, rowsPerBlock = 32,
      seed = 7L).toBlockMatrix(32, 3)
    val r3 = MLParity.randomMatrix(spark, 3L, 120, rowsPerBlock = 1,
      seed = 11L).toBlockMatrix(3, 32)
    val a = l3.multiply(r3) // 120×120, rank 3
    val (_, sv, _) = MLParity.svdCompressed(a, k = 5, powerIters = 0)
    val exact = a.toIndexedRowMatrix().toRowMatrix().computeSVD(3).s.toArray
    assert(sv.length >= 3)
    (0 until 3).foreach { i =>
      assert(math.abs(sv(i) - exact(i)) < 1e-6 * exact(0),
        s"sigma$i: ${sv(i)} vs ${exact(i)}")
    }
    // rank-3 input → trailing recovered values collapse to ~0
    sv.drop(3).foreach(s => assert(s < 1e-6 * exact(0)))
  }

  test("svdCompressed fails loudly on a numerically zero matrix") {
    import org.apache.spark.mllib.linalg.distributed.{BlockMatrix, IndexedRow, IndexedRowMatrix}
    import org.apache.spark.mllib.linalg.Vectors
    val zero = new IndexedRowMatrix(
      spark.sparkContext.parallelize((0L until 16L).map(i =>
        IndexedRow(i, Vectors.dense(Array.fill(16)(0.0)))), 2),
      16L, 16).toBlockMatrix(8, 8)
    val e = intercept[IllegalArgumentException] {
      MLParity.svdCompressed(zero, k = 3)
    }
    assert(e.getMessage.contains("no detectable spectrum"))
  }

  test("svdCompressed approximates the top spectrum of a full-rank matrix") {
    val a = MLParity.randomBlockMatrix(spark, 96, 32, seed = 5L)
    val (u, sv, v) = MLParity.svdCompressed(a, k = 3, oversample = 5,
      powerIters = 2)
    val exact = a.toIndexedRowMatrix().toRowMatrix().computeSVD(3).s.toArray
    // power-iterated rSVD: dominant value tight, next ones close
    assert(math.abs(sv(0) - exact(0)) < 0.01 * exact(0))
    (1 until 3).foreach(i =>
      assert(sv(i) <= exact(i) * 1.001 && sv(i) > 0.8 * exact(i)))
    // shapes: U m×k', V n×k
    assert(u.numCols() >= 3 && v.numRows == 96 && v.numCols == 3)
  }
}
