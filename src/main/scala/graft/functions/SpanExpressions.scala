package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused span extraction (F3/F4/F1): select spans of `kind`, project one
  * string field, optionally whitespace-normalize and drop blanks — in ONE
  * pass with full codegen.
  *
  * The composed form `filter(spans, s -> s.kind = k)` → `transform(…)` →
  * `transform(trim(regexp_replace(…)))` → `filter(blank)` uses Catalyst
  * higher-order functions, whose lambda bodies do not participate in
  * whole-stage codegen and allocate an intermediate array per step — the
  * `.explain("formatted")` of the extraction pipeline showed the final
  * Project dropping out of the codegen span because of them. This
  * expression restores the span and does zero intermediate allocation.
  */
case class SpanField(
    child: Expression,
    kind: String,
    fieldName: String,
    trimSpaces: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  private lazy val structType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val kindIdx = structType.fieldIndex("kind")
  private lazy val fieldIdx = structType.fieldIndex(fieldName)
  private lazy val numFields = structType.size

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
        if s.fieldNames.contains("kind") && s.fieldNames.contains(fieldName) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_field expects array<struct<…kind,$fieldName…>>, got ${child.dataType}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = SpanField.collectSpans(arr, UTF8String.fromString(kind),
      kindIdx, fieldIdx, numFields, trimSpaces)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kindRef = ctx.addReferenceObj("kindStr", UTF8String.fromString(kind),
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SpanField.collectSpans($c, $kindRef, $kindIdx, $fieldIdx, " +
        s"$numFields, $trimSpaces))")
  }

  override protected def withNewChildInternal(newChild: Expression): SpanField =
    copy(child = newChild)

  override def prettyName: String = "span_field"
}

object SpanField {
  /** single-pass select+project(+normalize) over a spans array; shared by
    * interpreted eval and generated code.
    */
  def collectSpans(arr: ArrayData, kind: UTF8String, kindIdx: Int, fieldIdx: Int,
      numFields: Int, trimSpaces: Boolean): Array[AnyRef] = {
    val n = arr.numElements()
    val buf = new java.util.ArrayList[AnyRef](8)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row: InternalRow = arr.getStruct(i, numFields)
        if (!row.isNullAt(kindIdx) && row.getUTF8String(kindIdx).equals(kind)) {
          if (row.isNullAt(fieldIdx)) {
            if (!trimSpaces) buf.add(null) // trim_spaces drops blanks/nulls (A1)
          } else {
            val s = row.getUTF8String(fieldIdx)
            if (!trimSpaces) buf.add(s)
            else {
              val t = normalizeWs(s.toString)
              if (t.nonEmpty) buf.add(UTF8String.fromString(t))
            }
          }
        }
      }
      i += 1
    }
    buf.toArray(new Array[AnyRef](buf.size()))
  }

  /** collapse whitespace runs to single spaces + trim (F1 semantics:
    * `replaceAll("\\s+"," ").trim`, ScrapingTransformer.java:523-531) —
    * manual scan, no regex.
    */
  def normalizeWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else { if (pendingSpace) { sb.append(' '); pendingSpace = false }; sb.append(c) }
      i += 1
    }
    sb.toString
  }

  def spanField(spans: Column, kind: String, field: String, trimSpaces: Boolean): Column =
    ColumnBridge.column(SpanField(ColumnBridge.expression(spans), kind, field, trimSpaces))
}
