package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

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

object LshExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def bandKeys(v: Column, planes: Array[Array[Double]], bands: Int, bits: Int): Column =
    ColumnBridge.column(EmbedBandKeys(ColumnBridge.expression(v),
      planes.flatten, bands, bits))

  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(EmbedLshBucket(ColumnBridge.expression(v),
      planes.flatten, planes.length))
}
