package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot vector/hash paths — the
  * preference-order "(b) native Expression beats a Scala UDF" tier of
  * the build brief. Both stay fully distributed and codegen-friendly:
  *
  *  - [[CosineSimilarity]]: one-pass fused dot+norms over two float
    *  arrays with `doGenCode` (a tight primitive loop inside
    *  whole-stage codegen) — replaces the interpreted
    *  `aggregate(zip_with(...))` higher-order-function chain in the
    *  ANN scoring path.
  *  - [[MinHashSignature]]: a `TypedImperativeAggregate` computing the
    *  full k-minhash signature in ONE pass with a primitive
    *  `Array[Long]` buffer — replaces k separate `min(xxhash64(...))`
    *  aggregate columns (k× less expression tree, same single
    *  shuffle, identical map-side partial-aggregation shape).
  */
object VectorFunctions {

  def cosine_sim(a: Column, b: Column): Column =
    GraftExpressionBridge.column(CosineSimilarity(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def minhash_signature(c: Column, numHashes: Int): Column =
    GraftExpressionBridge.column(
      MinHashSignature(GraftExpressionBridge.expression(c), numHashes)
        .toAggregateExpression())

  def simhash64(c: Column): Column =
    GraftExpressionBridge.column(
      SimHash64(GraftExpressionBridge.expression(c)).toAggregateExpression())

  def hyperplane_bucket(c: Column, numPlanes: Int): Column =
    GraftExpressionBridge.column(HyperplaneLshBucket(
      GraftExpressionBridge.expression(c), numPlanes))

  def decimal_dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DecimalDotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def md5_band_codes(c: Column, bands: Int, rowsPerBand: Int): Column =
    GraftExpressionBridge.column(Md5BandCodes(
      GraftExpressionBridge.expression(c), bands, rowsPerBand))

  def decimal_sign_dot(s: Column, v: Column): Column =
    GraftExpressionBridge.column(DecimalSignDotProduct(
      GraftExpressionBridge.expression(s), GraftExpressionBridge.expression(v)))

  def decimal_dot_fd(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DecimalDotFloatDouble(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}

/** md5-derived hyperplane family shared by interpreted eval and
  * generated code (the portable twin of [[HyperplaneLsh]]): weight
  * (p, i) = (int(md5("p:i")[0:15 hex]) % 1000 − 499.5) / 1000. JVM MD5
  * over UTF-8 bytes ≡ Spark `md5()` ≡ DuckDB `md5()`, so the DuckDB
  * oracle re-derives identical planes in SQL. Matrices memoized per
  * (planes, dims).
  */
object Md5Planes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  def weights(numPlanes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, dims), { key =>
      val (np, d) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(np, d) { (p, i) =>
        val hex = md.digest(s"$p:$i".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val m = java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000
        (m.toDouble - 499.5) / 1000.0
      }
    })

  /** All band codes in one pass: code b = Σ_j sign-bit(j) << j over
    * the band's `rowsPerBand` planes, with the sign defined by the
    * exact DECIMAL(38,18) fold of per-product scale-18 HALF_UP
    * roundings (the [[DecimalDot]] convention) — order-independent and
    * bit-identical to the interpreted `aggregate(zip_with(...))` fold
    * and the DuckDB oracle; a near-zero dot can't flip a bucket bit
    * between engines. Implementation shortcut: the plain double sum
    * differs from that decimal sum by < ~1e-12 (n·ulp accumulation
    * error plus n × 5e-19 rounding deltas at n = dims), so when
    * |double sum| > 1e-6 its sign IS the decimal sign and the
    * BigDecimal fold is skipped — it runs only for the vanishingly
    * rare near-zero dots, keeping the hot path pure primitive flops.
    */
  def codes(arr: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = arr.numElements()
    val w = weights(bands * rowsPerBand, n)
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var code = 0
      var j = 0
      while (j < rowsPerBand) {
        val wp = w(b * rowsPerBand + j)
        var fast = 0.0
        var i = 0
        while (i < n) { fast += arr.getFloat(i).toDouble * wp(i); i += 1 }
        val nonNeg =
          if (fast > 1e-6) true
          else if (fast < -1e-6) false
          else {
            var sum = java.math.BigDecimal.ZERO
            i = 0
            while (i < n) {
              val p = arr.getFloat(i).toDouble * wp(i)
              sum = sum.add(java.math.BigDecimal.valueOf(p)
                .setScale(18, java.math.RoundingMode.HALF_UP))
              i += 1
            }
            sum.signum() >= 0
          }
        if (nonNeg) code |= (1 << j)
        j += 1
      }
      out(b) = code
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused md5-portable LSH band codes of an `array<float>` column:
  * element b is band b's `rowsPerBand`-bit sign code against the
  * [[Md5Planes]] hyperplanes — one compiled pass over the vector
  * replacing bands × rowsPerBand interpreted decimal HOF folds, with
  * the exact same DECIMAL(38,18) sign semantics (see
  * [[Md5Planes.codes]]).
  */
case class Md5BandCodes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0 && rowsPerBand <= 31)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "md5_band_codes"

  override def nullSafeEval(v: Any): Any =
    Md5Planes.codes(v.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Planes.codes($a, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact-decimal dot product kernel shared by interpreted eval and
  * generated code: each per-element double product is rounded to 18
  * fractional digits HALF_UP — bit-identical to Spark's
  * `CAST(double AS DECIMAL(30,18))` (both go through the double's
  * shortest decimal representation) — then summed exactly, so the
  * result is order-independent and matches the engine's
  * `aggregate(zip_with(...))` decimal fold and the DuckDB oracle.
  */
object DecimalDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      sum = sum.add(java.math.BigDecimal.valueOf(p)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue
  }
}

/** Fused exact-decimal dot product of two `array<float>` columns
  * (double result) — replaces the interpreted
  * `aggregate(zip_with(...))` DECIMAL fold on the hot per-pair paths
  * (cosine top-k, ANN scoring) with a compiled loop, preserving the
  * engine's cross-engine exactness convention.
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DecimalDot.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[DecimalDot]] for a float-array × double-array pair (embedding ×
  * centroid) — same per-product scale-18 HALF_UP rounding and exact
  * sum, so it is bit-identical to the interpreted
  * `aggregate(zip_with(CAST(x AS DOUBLE) * y, ...))` DECIMAL fold and
  * the DuckDB oracle.
  */
object DecimalDotFD {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getDouble(i)
      sum = sum.add(java.math.BigDecimal.valueOf(p)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue
  }
}

/** Fused exact-decimal dot of an `array<float>` column against an
  * `array<double>` column (the IVF cell-assignment hot path) — a
  * compiled loop replacing the interpreted decimal HOF fold, same
  * exactness convention ([[DecimalDotFD.dot]]).
  */
case class DecimalDotFloatDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot_fd"

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotFD.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DecimalDotFD.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[DecimalDot]] for a ±1 `array<bigint>` sign row × `array<float>`
  * embedding (the sign-random-projection hot path): same per-product
  * scale-18 HALF_UP rounding and exact sum, so it is bit-identical to
  * the interpreted `aggregate(zip_with(srow, embedding, (s, v) ->
  * CAST(s * CAST(v AS DOUBLE) AS DECIMAL(30,18))), …)` fold it
  * replaces (r18) and to the DuckDB oracle — `s·v` promotes s to
  * double, exact for s ∈ {+1, −1}.
  */
object DecimalSignDot {
  def dot(s: ArrayData, v: ArrayData): Double = {
    val n = math.min(s.numElements(), v.numElements())
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = s.getLong(i).toDouble * v.getFloat(i).toDouble
      sum = sum.add(java.math.BigDecimal.valueOf(p)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue
  }
}

/** Fused exact-decimal signed projection coordinate — a compiled loop
  * for [[DecimalSignDot.dot]]'s convention on the random-projection
  * path.
  */
case class DecimalSignDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_sign_dot"

  override def nullSafeEval(s: Any, v: Any): Any =
    DecimalSignDot.dot(s.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = graft.functions.DecimalSignDot.dot($s, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deterministic pseudo-random hyperplane weights for LSH bucket
  * coding, shared by interpreted eval and generated code. Weight
  * (p, i) = ((xxhash64(p then i, seed 42) pmod 1000) − 499.5) / 1000 —
  * centered on 0 so no component is over-weighted, reproducible on any
  * cluster with no RNG state. Matrices are memoized per (planes, dims).
  */
object HyperplaneLsh {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  def weights(numPlanes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, dims), { key =>
      val (np, d) = key
      Array.tabulate(np, d) { (p, i) =>
        val h1 = XxHash64Function.hash(p.toLong, LongType, 42L)
        val h2 = XxHash64Function.hash(i.toLong, LongType, h1)
        val m = ((h2 % 1000) + 1000) % 1000
        (m - 499.5) / 1000.0
      }
    })
}

/** Fused LSH bucket code of an `array<float>` column: bit p of the
  * result is the sign of the dot product with pseudo-random hyperplane
  * p ([[HyperplaneLsh.weights]]). One tight primitive loop inside
  * whole-stage codegen — replaces `numPlanes` interpreted
  * `aggregate(zip_with(...))` passes over the vector.
  */
case class HyperplaneLshBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 31, "numPlanes must fit an int bucket")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val w = HyperplaneLsh.weights(numPlanes, n)
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += arr.getFloat(i).toDouble * w(p)(i); i += 1 }
      if (dot >= 0.0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |double[][] $w = graft.functions.HyperplaneLsh.weights($numPlanes, $n);
         |int $bucket = 0;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * $w[$p][$i];
         |  }
         |  if ($dot >= 0.0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass 64-bit SimHash over a token column: per token, each bit j
  * of xxhash64(token) votes +1/-1 into a 64-counter buffer; the final
  * hash sets bit j where the vote is positive. Token multiplicity IS
  * the term-frequency weight, so the input needs no pre-counting —
  * one aggregation, one shuffle, mergeable partials.
  */
case class SimHash64(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v.asInstanceOf[UTF8String], StringType, 42L)
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): SimHash64 =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimHash64 =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Fused cosine similarity of two `array<float>` columns (double
  * result; 0.0 when either norm is zero). Null-intolerant, codegen'd.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are library-controlled: two array<float> columns
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass k-minhash signature over a (string) shingle column:
  * `sig[i] = min over rows of xxhash64(shingle, seed = i)`. Buffer is a
  * primitive Array[Long]; partial aggregation merges element-wise
  * minima, so the shuffle carries one signature per group, not per
  * row.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, StringType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashSignature =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashSignature =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
