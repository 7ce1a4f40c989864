package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Single-pass kernel for sign-projection LSH band keys.
  *
  * The declarative formulation (`transform` over a 2-D plane literal with a
  * `zip_with`+`aggregate` dot product per plane) is semantically right but
  * higher-order functions evaluate interpreted with boxed lambdas — at the
  * production 20 bands × 10 bits that is 200 boxed folds per row, ~2 ms/row,
  * and the cost lands TWICE because the banded self-join recomputes the
  * subtree on both sides. This expression computes every sign in one
  * primitive loop (planes ride along as a codegen reference object, not a
  * literal subtree) and participates in whole-stage codegen — preference
  * order (b) in SURVEY.md §7.4.
  *
  * Key semantics are identical to the declarative form (locked by the
  * DuckDB oracles): key of band b is the MSB-first fold of the sign bits of
  * planes [b·bits, (b+1)·bits).
  */
object LshKernel {
  /** band keys for one vector; `fromFloat` selects the element reader (a
    * float read widened to double equals `cast(v as array<double>)`, so
    * callers can skip the per-element cast lambda).
    */
  def bandKeys(v: ArrayData, planes: Array[Double], bands: Int, bits: Int,
      fromFloat: Boolean): ArrayData = {
    val dim = planes.length / (bands * bits)
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](bands)
    var j = 0
    while (j < bands * bits) {
      val off = j * dim
      var d = 0.0
      var c = 0
      if (fromFloat) while (c < n) { d += v.getFloat(c) * planes(off + c); c += 1 }
      else while (c < n) { d += v.getDouble(c) * planes(off + c); c += 1 }
      val b = j / bits
      keys(b) = keys(b) * 2 + (if (d > 0) 1L else 0L)
      j += 1
    }
    new GenericArrayData(keys)
  }

  /** single bucket id: LSB-first — bit b set iff dot with plane b is
    * positive (the [[graft.ops.Similarity.lshBucket]] convention).
    */
  def bucket(v: ArrayData, planes: Array[Double], nBits: Int,
      fromFloat: Boolean): Long = {
    val dim = planes.length / nBits
    val n = math.min(v.numElements(), dim)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var d = 0.0
      var c = 0
      if (fromFloat) while (c < n) { d += v.getFloat(c) * planes(off + c); c += 1 }
      else while (c < n) { d += v.getDouble(c) * planes(off + c); c += 1 }
      if (d > 0) bucket |= 1L << b
      b += 1
    }
    bucket
  }
}

/** `array<float|double>` → LSB-first sign-projection bucket id (long). */
case class EmbedLshBucket(child: Expression, planes: Array[Double],
    nBits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    LshKernel.bucket(v.asInstanceOf[ArrayData], planes, nBits, fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshKernel.bucket($c, $planesRef, $nBits, $fromFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedLshBucket =
    copy(child = newChild)

  override def prettyName: String = "embed_lsh_bucket"
}

/** Primitive-loop vector math shared by the similarity/dedup surfaces.
  * Fold order is ascending-index, matching the declarative
  * `aggregate(zip_with(...))` formulation bit-for-bit (the DuckDB oracles
  * lock the resulting doubles), and float elements widen to double exactly
  * like `cast(v as array<double>)`.
  */
object VecKernel {
  def dotConst(v: ArrayData, q: Array[Double], fromFloat: Boolean): Double = {
    val n = math.min(v.numElements(), q.length)
    var d = 0.0
    var c = 0
    if (fromFloat) while (c < n) { d += v.getFloat(c) * q(c); c += 1 }
    else while (c < n) { d += v.getDouble(c) * q(c); c += 1 }
    d
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var c = 0
    while (c < n) {
      val x = if (aFloat) a.getFloat(c).toDouble else a.getDouble(c)
      val y = if (bFloat) b.getFloat(c).toDouble else b.getDouble(c)
      d += x * y
      c += 1
    }
    d
  }

  /** MinHash signature in ONE pass over the shingle-hash array: sig[j] =
    * min over s of floorMod(s·a_j + b_j, p), initialized to p — the exact
    * fold the declarative `aggregate(hashes, P, least(acc, pmod(s·a+b, P)))`
    * performs per hash function, but without m interpreted folds per row.
    */
  def minhashSig(hashes: ArrayData, coefA: Array[Long], coefB: Array[Long],
      p: Long): ArrayData = {
    val m = coefA.length
    val sig = Array.fill(m)(p)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val s = hashes.getLong(i)
      var j = 0
      while (j < m) {
        val v = java.lang.Math.floorMod(s * coefA(j) + coefB(j), p)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash from a token-hash array in one pass: bit b of the result is 1
    * iff Σ (2·bit_b(h) − 1) > 0 — per-bit integer sums, order-independent,
    * so it equals the declarative per-bit `aggregate` folds exactly.
    */
  def simhash(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < bits) { votes(b) += ((h >>> b) & 1L) * 2 - 1; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  private def xx64(s: org.apache.spark.unsafe.types.UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** k-token shingle hashes in one pass: shingle i = tokens[i..i+k-1]
    * joined with " ", hashed with Spark's xxhash64 (seed 42) mod p — the
    * exact values of `pmod(xxhash64(concat_ws(" ", …)), p)` over the
    * declarative shingle build, without materializing shingle strings
    * through two interpreted `transform` passes. Fewer than k tokens →
    * one shingle of the whole token list (the declarative `otherwise`).
    */
  def shingleXxHashes(toks: ArrayData, k: Int, p: Long): ArrayData = {
    val n = toks.numElements()
    if (n >= k) {
      val m = n - k + 1
      val out = new Array[Long](m)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        val s = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
        out(i) = java.lang.Math.floorMod(xx64(s), p)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(j); j += 1 }
      val s = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      new GenericArrayData(Array(java.lang.Math.floorMod(xx64(s), p)))
    }
  }

  /** per-token xxhash64 (seed 42) — the values of `transform(toks, xxhash64)`. */
  def tokenXxHashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = xx64(toks.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  def norm(v: ArrayData, fromFloat: Boolean): Double = {
    val n = v.numElements()
    var d = 0.0
    var c = 0
    if (fromFloat) while (c < n) { val x = v.getFloat(c).toDouble; d += x * x; c += 1 }
    else while (c < n) { val x = v.getDouble(c); d += x * x; c += 1 }
    math.sqrt(d)
  }
}

/** `array<float|double>` → `array<long>` of [[LshKernel.bandKeys]]. */
case class EmbedBandKeys(child: Expression, planes: Array[Double],
    bands: Int, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    LshKernel.bandKeys(v.asInstanceOf[ArrayData], planes, bands, bits, fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshKernel.bandKeys($c, $planesRef, $bands, $bits, $fromFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedBandKeys =
    copy(child = newChild)

  override def prettyName: String = "embed_band_keys"
}

private[graft] object VecTypes {
  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** dot with a constant vector (query / centroid). */
case class VecDotConst(child: Expression, q: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def fromFloat = VecTypes.isFloatArray(child.dataType)

  override def nullSafeEval(v: Any): Any =
    VecKernel.dotConst(v.asInstanceOf[ArrayData], q, fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("vecQ", q, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernel.dotConst($c, $qRef, $fromFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecDotConst =
    copy(child = newChild)
  override def prettyName: String = "vec_dot_const"
}

/** L2 norm of a vector column. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def fromFloat = VecTypes.isFloatArray(child.dataType)

  override def nullSafeEval(v: Any): Any =
    VecKernel.norm(v.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernel.norm($c, $fromFloat)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
  override def prettyName: String = "vec_norm"
}

/** `array<long>` shingle hashes → `array<long>` MinHash signature. */
case class MinhashSig(child: Expression, coefA: Array[Long], coefB: Array[Long],
    p: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecKernel.minhashSig(v.asInstanceOf[ArrayData], coefA, coefB, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernel.minhashSig($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** `array<string>` tokens → `array<long>` of [[VecKernel.shingleXxHashes]]. */
case class ShingleXxHashes(child: Expression, k: Int, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecKernel.shingleXxHashes(v.asInstanceOf[ArrayData], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernel.shingleXxHashes($c, $k, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): ShingleXxHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_xxhashes"
}

/** `array<string>` tokens → `array<long>` of per-token xxhash64. */
case class TokenXxHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecKernel.tokenXxHashes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernel.tokenXxHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenXxHashes =
    copy(child = newChild)
  override def prettyName: String = "token_xxhashes"
}

/** `array<long>` token hashes → simhash (long). */
case class SimhashOf(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecKernel.simhash(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernel.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashOf =
    copy(child = newChild)
  override def prettyName: String = "simhash_of"
}

/** dot of two vector columns (pair verification joins).
  *
  * Mismatched dimensions yield NULL, matching the declarative
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` this kernel replaces: zip_with
  * pads the shorter array with null, the sum goes null, and a `>= threshold`
  * filter drops the pair — malformed embeddings must not silently produce a
  * partial dot that passes as a near-dup.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  private def aFloat = VecTypes.isFloatArray(left.dataType)
  private def bFloat = VecTypes.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else VecKernel.dot(av, bv, aFloat, bFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VecKernel.dot($a, $b, $aFloat, $bFloat);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

object LshExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def bandKeys(v: Column, planes: Array[Array[Double]], bands: Int, bits: Int): Column =
    ColumnBridge.column(EmbedBandKeys(ColumnBridge.expression(v),
      planes.flatten, bands, bits))

  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(EmbedLshBucket(ColumnBridge.expression(v),
      planes.flatten, planes.length))

  def dotConst(v: Column, q: Seq[Double]): Column =
    ColumnBridge.column(VecDotConst(ColumnBridge.expression(v), q.toArray))

  def norm(v: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(v)))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(hashes: Column, coefA: Array[Long], coefB: Array[Long], p: Long): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(hashes), coefA, coefB, p))

  def simhash(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimhashOf(ColumnBridge.expression(hashes), bits))

  def shingleXxHashes(toks: Column, k: Int, p: Long): Column =
    ColumnBridge.column(ShingleXxHashes(ColumnBridge.expression(toks), k, p))

  def tokenXxHashes(toks: Column): Column =
    ColumnBridge.column(TokenXxHashes(ColumnBridge.expression(toks)))
}
