package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),  // near vec 0
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.0f, 1.0f), 2),
    (4L, Array(1.0f, 0.0f, 0.0f), 0)   // identical direction to vec 0
  ).toDF("vec_id", "embedding", "label")

  test("cosineTopK ranks identical direction first") {
    val rows = Similarity.cosineTopK(emb, numQueries = 1, k = 3).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(4L, 1L, 2L))
    assert(rows.head.getDouble(2) == 1.0)
    val orth = rows.find(_.getLong(1) == 2L).get
    assert(orth.getDouble(2) == 0.0)
  }

  test("labelCentroids computes per-label element means") {
    val cents = Similarity.labelCentroids(emb).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c0 = cents(0)
    // dsum carries DECIMAL(25,6) precision — float 0.9 rounds to 0.9
    assert(math.abs(c0.head - 2.9 / 3) < 1e-6)
    assert(cents(1) == Seq(0.0, 1.0, 0.0))
  }

  test("annLshTopK finds the identical-direction neighbor in-bucket") {
    val rows = Similarity.annLshTopK(emb, numQueries = 1, k = 3)
      .collect().map(_.getLong(2))
    assert(rows.contains(4L)) // identical vector always shares the bucket
  }

  test("cosineTopKAgg (bounded heap aggregate) equals the window form") {
    val win = Similarity.cosineTopK(emb, numQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val agg = Similarity.cosineTopKAgg(emb, numQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(win.toSeq == agg.toSeq)
  }

  test("annRecall measures IVF overlap with the brute-force ground truth") {
    val out = Similarity.annRecall(emb, numQueries = 2, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(0L, 1L))
    out.values.foreach { case (k, hits, recall) =>
      assert(k == 2L && hits >= 0L && hits <= k)
      assert(recall == hits.toDouble / k)
    }
    // layout-independent
    val again = Similarity.annRecall(emb.repartition(3), numQueries = 2, k = 2)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(again == out)
  }

  test("embeddingNearDups verifies banded candidates against the exact cosine") {
    val pairs = Similarity.embeddingNearDups(emb, minCosine = 0.9, dims = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // identical-direction vectors always share every band code
    assert(pairs((0L, 4L)) == 1.0)
    assert(pairs.keySet.forall(p => p._1 < p._2))
    // orthogonal pairs can never pass the cosine >= 0.9 verify
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((0L, 3L)))
  }

  test("ivfTopKExact matches ivfTopK's cell structure for the twin query") {
    val rows = Similarity.ivfTopKExact(emb, numQueries = 1, k = 2)
      .collect().map(_.getLong(2))
    assert(rows.contains(4L)) // identical vector lands in the same cell
  }

  test("ivfTopK probes the query's cell and finds its twin") {
    val rows = Similarity.ivfTopK(emb, numQueries = 1, k = 3)
      .collect().map(_.getLong(2))
    assert(rows.contains(4L)) // identical vector lands in the same cell
  }

  // 3 well-separated direction clusters, 20 vectors each; the first 3
  // vec_ids (the k-means seeds) land one per cluster, so Lloyd rounds
  // must keep them apart and pull every member to its cluster's cell
  private def clusteredEmb = {
    val rnd = new scala.util.Random(5)
    val axes = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f))
    Seq.tabulate(60) { i =>
      val a = axes(i % 3)
      val v = a.map(x => x + rnd.nextFloat() * 0.1f)
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")
  }

  test("ivfKmeansTopK recovers separable clusters as cells") {
    val out = Similarity.ivfKmeansTopK(clusteredEmb, cells = 3, iters = 3,
      numQueries = 6, k = 5).collect()
    // every query's neighbors come from its own ground-truth cluster
    out.foreach { r =>
      assert(r.getLong(0) % 3 == r.getLong(2) % 3,
        s"query ${r.getLong(0)} matched cross-cluster ${r.getLong(2)}")
    }
    // all 6 queries produced a full top-5 (their cells hold 20 vecs)
    assert(out.length == 30)
  }

  test("ivfKmeansTopKExact agrees with the float path on neighbor sets") {
    val fl = Similarity.ivfKmeansTopK(clusteredEmb, cells = 3, iters = 2,
      numQueries = 6, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ex = Similarity.ivfKmeansTopKExact(clusteredEmb, cells = 3, iters = 2,
      numQueries = 6, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(fl == ex) // well-separated data: rounding can't flip ranks
  }

  test("semanticDecontaminate flags corpus vectors near a bench vector") {
    // benchMod=3 → vec_ids 0 and 3 are benchmark; 1 is an exact copy
    // of bench 0, 4 is a near-copy, 2 is orthogonal to both
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f, 1.0f), 1),
      (3L, Array(0.0f, 1.0f, 0.0f), 2),
      (4L, Array(0.1f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDecontaminate(e, tau = 0.9, benchMod = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(1L, 4L)) // 2 is clean, bench rows excluded
    assert(out(1L) == ((0L, 1.0))) // exact copy → cosine 1 vs bench 0
    assert(out(4L)._1 == 3L && out(4L)._2 > 0.99 && out(4L)._2 < 1.0)
  }

  test("semanticDecontaminate worst-match ties break to the lowest bench id") {
    // two identical bench vectors (0 and 3) — the contaminated copy
    // must report bench_id 0
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDecontaminate(e, tau = 0.5, benchMod = 3)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 0L)
  }

  test("knnClassify predicts by neighbor majority with per-label accuracy") {
    // two clean clusters on orthogonal axes + one mislabeled vector:
    // queries 0 and 1 (label 0) sit in the x-cluster whose remaining
    // members vote label 0; query 2 (label 1) sits alone in the
    // y-direction — its 2 nearest are x-cluster docs voting label 0 →
    // misclassified
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.95f, 0.05f, 0.0f), 0),
      (4L, Array(1.0f, 0.01f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(e, numQueries = 3, k = 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0) == ((2L, 2L, 1.0))) // both label-0 queries correct
    assert(out(1) == ((1L, 0L, 0.0))) // the lone label-1 query flips
  }

  test("knnClassify majority ties break to the smallest label") {
    // query 0's two nearest neighbors carry labels 2 and 1 (one vote
    // each) → predicted must be 1
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 5),
      (1L, Array(0.9f, 0.1f), 2),
      (2L, Array(0.9f, -0.1f), 1),
      (3L, Array(-1.0f, 0.0f), 5)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(e, numQueries = 1, k = 2).collect()
    assert(out.length == 1)
    assert(out.head.getInt(0) == 5 && out.head.getLong(2) == 0L)
    // re-run with k=3: votes 2:1, 1:1, 5:1 → ties at 1 vote include
    // the true label but 1 < 2 < 5 → still predicted 1, still wrong
    val out3 = Similarity.knnClassify(e, numQueries = 1, k = 3).collect()
    assert(out3.head.getLong(2) == 0L)
  }

  test("semanticDedup keeps the member farthest from the centroid") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0), // centroid-identical copy of 0
      (2L, Array(0.0f, 1.0f, 0.0f), 1), // orthogonal — singleton
      (3L, Array(0.9f, 0.1f, 0.0f), 0)  // near 0/1 but off-centroid
    ).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.semanticDedup(df, cells = 1, iters = 1, tau = 0.9)
    val out = run(e).collect().map(r => r.getLong(0) ->
      ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // {0,1,3} form one duplicate group (pairwise cosine ≥ 0.9);
    // SemDeDup's rule keeps the LOWEST centroid cosine — vec 3 —
    // and drops both centroid-identical copies
    assert(out(0L) == ((0L, 3L, false)))
    assert(out(1L) == ((0L, 3L, false)))
    assert(out(3L) == ((0L, 3L, true)))
    assert(out(2L) == ((2L, 1L, true)))
    // total map + layout independence: one keeper per group, verdicts
    // identical from any input partitioning
    val re = run(e.repartition(5)).collect().map(_.toString)
    assert(re.sameElements(run(e).collect().map(_.toString)))
  }

  test("semanticDedup collapses an exact-duplicate mass without pairing it") {
    // 60 identical boilerplate embeddings + 2 distinct vectors: the
    // identical mass must come back as ONE group of 60 kept by its
    // min id (the exact-dup collapse guard), not 60·59/2 pairs
    val rows = (0L until 60L).map(i => (i, Array(1.0f, 0.0f, 0.0f), 0)) ++
      Seq((60L, Array(0.0f, 1.0f, 0.0f), 1),
        (61L, Array(0.9f, 0.1f, 0.0f), 0))
    val e = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedup(e, cells = 1, iters = 1, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // vec 61 joins the boilerplate group via real pairing (cos 0.994)
    // and, as the farthest-from-centroid member, is the keeper
    assert(out(61L) == ((0L, 61L, true)))
    assert((0L until 60L).forall(i => out(i) == ((0L, 61L, false))))
    assert(out(60L) == ((60L, 1L, true)))
  }

  test("semanticDedupIncremental: delta verdicts against a persisted index") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1),
      (2L, Array(1.0f, 0.0f, 0.0f), 0), // exact copy of 0
      (3L, Array(0.0f, 0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val delta = Seq(
      (100L, Array(1.0f, 0.05f, 0.0f), 0), // near base 0/2 → dup
      (101L, Array(-1.0f, 0.0f, 0.0f), 1), // anti-parallel → kept
      (102L, Array(0.0f, 0.0f, 1.0f), 2)   // exact copy of base 3 → dup
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("semstore").toString + "/store"
    Similarity.writeSemanticStore(base, dir, cells = 2, iters = 1)
    val out = Similarity.semanticDedupIncremental(dir, delta, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    // worst-match tie: 100 matches base 0 AND its exact copy 2 at the
    // same cosine — must report the LOWEST base id
    assert(out(100L) == ((true, 0L)))
    assert(out(101L) == ((false, -1L)))
    assert(out(102L) == ((true, 3L)))
    // store round-trip is idempotent: a second read gives the same
    // verdicts from any delta partitioning
    val again = Similarity
      .semanticDedupIncremental(dir, delta.repartition(4), tau = 0.9)
      .collect().map(_.toString)
    assert(again.sameElements(Similarity
      .semanticDedupIncremental(dir, delta, tau = 0.9)
      .collect().map(_.toString)))
  }

  test("ensureSemanticStore rebuilds a partial (uncommitted) store") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(1.0f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // first ensure builds; a second ensure with the same content must
    // reuse (same path, no rebuild marker change)
    val p1 = Similarity.ensureSemanticStore(base, "partialspec", cells = 2,
      iters = 1)
    val stamp1 = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(p1 + "/vectors/_SUCCESS"))
      .getModificationTime
    assert(Similarity.ensureSemanticStore(base, "partialspec", cells = 2,
      iters = 1) == p1)
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(
      p1 + "/vectors/_SUCCESS")).getModificationTime == stamp1)
    // sabotage: delete one half's _SUCCESS — the completeness gate
    // must refuse the partial and rebuild
    fs.delete(new org.apache.hadoop.fs.Path(p1 + "/codebook/_SUCCESS"),
      false)
    assert(!Similarity.isCompleteSemanticStore(fs, p1))
    val p2 = Similarity.ensureSemanticStore(base, "partialspec", cells = 2,
      iters = 1)
    assert(p2 == p1 && Similarity.isCompleteSemanticStore(fs, p2))
  }

  test("appendToSemanticStore: later batches gate against appended keeps") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("semstore_app").toString + "/store"
    Similarity.writeSemanticStore(base, dir, cells = 2, iters = 1)
    // batch 1: one dup of base 0 (discarded) and one genuinely new
    // direction (kept, appended)
    val b1 = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f), 0),
      (11L, Array(0.0f, 0.6f, 0.8f), 1)
    ).toDF("vec_id", "embedding", "label")
    Similarity.appendToSemanticStore(dir, b1, tau = 0.9)
    // batch 2: a near-copy of batch 1's KEPT vector must now be
    // flagged against it; a copy of the DISCARDED dup still matches
    // the original base vector, not the dropped 10
    val b2 = Seq(
      (20L, Array(0.0f, 0.6f, 0.8f), 1),
      (21L, Array(1.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedupIncremental(dir, b2, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(out(20L) == ((true, 11L)))
    assert(out(21L) == ((true, 0L)))
    // the store grew by exactly the kept row
    val n = spark.read.parquet(dir + "/vectors").count()
    assert(n == 3L)
  }

  test("rebuildSemanticStore: rebuild equals a fresh write over the accumulated rows") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1),
      (2L, Array(0.9f, 0.1f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("semstore_rb").toString + "/store"
    Similarity.writeSemanticStore(base, dir, cells = 2, iters = 1)
    val b1 = Seq(
      (10L, Array(0.0f, 0.0f, 1.0f), 2), // new direction → kept
      (11L, Array(1.0f, 0.0f, 0.0f), 0)  // dup of base 0 → dropped
    ).toDF("vec_id", "embedding", "label")
    Similarity.appendToSemanticStore(dir, b1, tau = 0.9)
    // the staged append leaves no staging residue in the store tree
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(dir + "/.append_stage")))
    // rebuild re-trains on base ∪ kept(batch); law: byte-identical to
    // a fresh writeSemanticStore over the same accumulated rows
    Similarity.rebuildSemanticStore(spark, dir, cells = 2, iters = 2)
    val freshDir = java.nio.file.Files
      .createTempDirectory("semstore_rbf").toString + "/store"
    val accumulated = base.unionAll(
      Seq((10L, Array(0.0f, 0.0f, 1.0f), 2))
        .toDF("vec_id", "embedding", "label"))
    Similarity.writeSemanticStore(accumulated, freshDir, cells = 2,
      iters = 2, hashSeeds = true)
    def rows(p: String): Seq[String] =
      spark.read.parquet(p).collect().map(_.toString).sorted.toSeq
    assert(rows(dir + "/vectors") == rows(freshDir + "/vectors"))
    assert(rows(dir + "/codebook") == rows(freshDir + "/codebook"))
    assert(Similarity.isCompleteSemanticStore(fs, dir))
    // and the rebuilt store still gates: a copy of the appended keep
    // is now a dup OF that keep
    val out = Similarity.semanticDedupIncremental(dir,
      Seq((30L, Array(0.0f, 0.0f, 1.0f), 2))
        .toDF("vec_id", "embedding", "label"), tau = 0.9)
      .collect()
    assert(out.length == 1 && out.head.getBoolean(3) &&
      out.head.getLong(4) == 10L)
  }

  test("hardNegatives excludes same-label vectors however similar") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),  // query
      (1L, Array(1.0f, 0.0f, 0.0f), 0),  // identical but SAME label
      (2L, Array(0.9f, 0.1f, 0.0f), 1),  // near + wrong label → top neg
      (3L, Array(0.0f, 1.0f, 0.0f), 1),  // orthogonal wrong label
      (4L, Array(0.8f, 0.2f, 0.0f), 2)   // near + wrong label
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(e, numQueries = 1, k = 3).collect()
      .map(r => (r.getLong(2), r.getInt(3), r.getInt(5))) // cid,c_label,rk
    // the identical same-label vector 1 never appears
    assert(!out.exists(_._1 == 1L))
    // negatives ranked by similarity: 2 (cos .994) > 4 (.970) > 3 (0)
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 3L))
    assert(out.map(_._3).toSeq == Seq(1, 2, 3))
    // labels come back correctly from the join-back
    assert(out.map(_._2).toSeq == Seq(1, 2, 1))
  }

  test("randomProject matches the documented md5 sign chain") {
    val e = Seq((0L, Array(1.0f, -2.0f, 0.5f), 0)).toDF(
      "vec_id", "embedding", "label")
    val out = Similarity.randomProject(e, outDims = 2, dims = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    // recompute from the documented hash chain: s(i,j) = 1 - 2·(h60 % 2)
    def sign(i: Int, j: Int): Long = {
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
      1L - 2L * (h % 2)
    }
    val v = Seq(1.0, -2.0, 0.5)
    val expected = (0 until 2).map { i =>
      val p = (0 until 3).map(j => sign(i, j) * v(j)).sum
      math.floor(p * 1e6 + 0.5).toLong
    }
    assert(out(0L) == expected)
  }

  test("decimal_sign_dot kernel == exact sum of CAST-to-DECIMAL(30,18)") {
    // reference semantics = the ORACLE's: DuckDB computes
    // SUM(CAST(s·v AS DECIMAL(30,18))) with an exact wide accumulator.
    // The r18 kernel reproduces that (per-element shortest-decimal
    // scale-18 HALF_UP, then EXACT sum). NOTE the interpreted Spark
    // fold it replaced is NOT that on adversarial values: Spark types
    // decimal(38,18) + decimal(30,18) as decimal(38,17), so each fold
    // step rounds the partial sum at 1e-17 — measured divergent from
    // the exact sum on sub-1e-6 inputs (r18 DecProbe). On float-clean
    // fixture magnitudes all three agree, which is why the interpreted
    // form was oracle-green; the kernel is the convention-faithful
    // form at every magnitude. Spark's scalar CAST itself was probed
    // identical to valueOf+setScale on 2000 magnitudes (1e-9…0.5).
    import org.apache.spark.sql.functions.{col, expr}
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val v = Array.fill(16)(
        (rnd.nextFloat() - 0.5f) * (if (i % 3 == 0) 1e-6f else 4f))
      val s = Array.fill(16)(if (rnd.nextBoolean()) 1L else -1L)
      (i.toLong, v, s)
    }
    val df = rows.toDF("id", "v", "s")
    val got = df.select(col("id"),
      graft.functions.VectorFunctions
        .decimal_sign_dot(col("s"), col("v")).as("kern"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v, s) =>
      var sum = java.math.BigDecimal.ZERO
      v.zip(s).foreach { case (vf, sl) =>
        sum = sum.add(java.math.BigDecimal
          .valueOf(sl.toDouble * vf.toDouble)
          .setScale(18, java.math.RoundingMode.HALF_UP))
      }
      assert(java.lang.Double.doubleToRawLongBits(got(id)) ==
        java.lang.Double.doubleToRawLongBits(sum.doubleValue),
        s"row $id: kernel ${got(id)} != reference ${sum.doubleValue}")
    }
  }

  test("rpTopK: projected cosine is exact-integer, self-dup ranks first") {
    // vec 3 duplicates vec 0's direction → projected cosine 1.0 exactly
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
      (3L, Array(2.0f, 0.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f), 2) // zero vector → -2.0 guard
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.rpTopK(e, outDims = 8, dims = 4,
        numQueries = 1, k = 4).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // scaled copy of the query projects to a colinear integer vector
    assert(out.head._1 == 3L && math.abs(out.head._2 - 1.0) < 1e-9 && out.head._3 == 1)
    // the zero vector scores the -2.0 sentinel and sorts last
    assert(out.last._1 == 4L && out.last._2 == -2.0)
    // layout independence
    val re = Similarity.rpTopK(e.repartition(5), outDims = 8, dims = 4,
      numQueries = 1, k = 4).collect().map(_.toString)
    assert(re.sameElements(Similarity.rpTopK(e, outDims = 8, dims = 4,
      numQueries = 1, k = 4).collect().map(_.toString)))
  }

  test("rpRecall: identical-direction neighbors survive any projection") {
    // clustered data (the case JL exists for): recall of the top-1
    // within a tight cluster is 1.0 even at an aggressive cut
    val rows = (0L until 12L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.01f * i, 0.0f, 0.0f)
        else Array(0.0f, 0.0f, 1.0f, 0.01f * i)
      (i, base, (i % 2).toInt)
    }
    val e = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.rpRecall(e, outDims = 2, dims = 4,
        numQueries = 2, k = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // each query's 3 nearest are its own tight cluster — preserved
    assert(out.values.forall(_ >= 2.0 / 3))
  }

  test("clustered fixture makes the recall evals able to fail: floors hold") {
    // r9 verdict finding 3: on the isotropic fixture neighbor gaps sit
    // below JL/PQ distortion, so a broken index and a good one score
    // alike (~0.16). The planted-cluster transform fixes that: exact
    // top-k is dominated by true planted neighbors, and the indexes
    // must find them. Floors sit below the measured minima (IVF 1.0,
    // PQ 0.6, RP 0.4 per-query min at sf0.001/0.01) but 30-90x above
    // a broken index's ~k/N ≈ 0.01.
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cl = Similarity.clusteredEmbeddings(emb)
    def recalls(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.collect().map(_.getAs[Double]("recall_at_k")).toSeq
    val ivf = recalls(Similarity.annRecall(cl))
    assert(ivf.nonEmpty && ivf.forall(_ >= 0.9), s"ivf=$ivf")
    val pq = recalls(graft.operators.Quantize.pqRecall(cl, m = 16, k = 64))
    assert(pq.nonEmpty && pq.forall(_ >= 0.5), s"pq=$pq")
    val rp = recalls(Similarity.rpRecall(cl))
    assert(rp.nonEmpty && rp.forall(_ >= 0.3), s"rp=$rp")
    // the discrimination itself: the SAME ivf pipeline on the
    // isotropic originals scores like noise — the clustered fixture is
    // what turns recall into a gate that can actually fail
    val iso = recalls(Similarity.annRecall(emb))
    assert(iso.sum / iso.size < 0.5, s"iso=$iso")
    // planted structure sanity: every vector's exact nearest neighbors
    // share its cluster id (vec_id % 50) by construction
    val exact = Similarity.cosineTopKAgg(cl, numQueries = 5, k = 3)
      .collect()
    assert(exact.forall(r => r.getLong(1) % 50 == r.getLong(0) % 50))
  }
}
