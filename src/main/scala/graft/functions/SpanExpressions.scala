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

  /** join all non-null span texts with " " (F8 `source`) — the values of
    * `array_join(filter(transform(spans, s.text), notNull), " ")`.
    */
  def joinText(arr: ArrayData, fieldIdx: Int, numFields: Int): UTF8String = {
    val n = arr.numElements()
    val buf = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, numFields)
        if (!row.isNullAt(fieldIdx)) buf.add(row.getUTF8String(fieldIdx))
      }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      buf.toArray(new Array[UTF8String](buf.size())): _*)
  }

  /** Σ length(span.text) in characters, null spans/texts contributing 0 —
    * the values of `aggregate(transform(spans, coalesce(length(text),0)),
    * 0L, acc+x)`.
    */
  def totalTextChars(arr: ArrayData, fieldIdx: Int, numFields: Int): Long = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, numFields)
        if (!row.isNullAt(fieldIdx)) total += row.getUTF8String(fieldIdx).numChars()
      }
      i += 1
    }
    total
  }

  /** first-occurrence distinct + the U2/P9 child filters in one pass —
    * the values of `filter(array_distinct(children), u -> u.isNotNull &&
    * trim(u) != '' && u != url && u != url || "/")` (trim = ASCII space
    * only, like Spark's `trim`).
    */
  def childCandidates(children: ArrayData, url: UTF8String): ArrayData = {
    val urlSlash = UTF8String.concat(url, UTF8String.fromString("/"))
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[UTF8String](8)
    val n = children.numElements()
    var i = 0
    while (i < n) {
      if (!children.isNullAt(i)) {
        val u = children.getUTF8String(i)
        if (seen.add(u)) {
          // trim(u) != "": does any non-space byte exist?
          val b = u.getBytes
          var hasNonSpace = false
          var j = 0
          while (j < b.length && !hasNonSpace) { hasNonSpace = b(j) != ' '; j += 1 }
          if (hasNonSpace && !u.equals(url) && !u.equals(urlSlash)) out.add(u)
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** `array<struct<…>>` spans → all texts joined with " " (F8 source). */
case class SpanTextJoin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  private lazy val structType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val fieldIdx = structType.fieldIndex("text")
  private lazy val numFields = structType.size

  override def nullSafeEval(v: Any): Any =
    SpanField.joinText(v.asInstanceOf[ArrayData], fieldIdx, numFields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpanField.joinText($c, $fieldIdx, $numFields)")

  override protected def withNewChildInternal(newChild: Expression): SpanTextJoin =
    copy(child = newChild)
  override def prettyName: String = "span_text_join"
}

/** `array<struct<…>>` spans → total text characters (contentLength). */
case class SpanTextLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private lazy val structType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val fieldIdx = structType.fieldIndex("text")
  private lazy val numFields = structType.size

  override def nullSafeEval(v: Any): Any =
    SpanField.totalTextChars(v.asInstanceOf[ArrayData], fieldIdx, numFields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpanField.totalTextChars($c, $fieldIdx, $numFields)")

  override protected def withNewChildInternal(newChild: Expression): SpanTextLength =
    copy(child = newChild)
  override def prettyName: String = "span_text_length"
}

/** (children array, page url) → distinct, blank/self-filtered child set. */
case class ChildCandidates(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(children: Any, url: Any): Any =
    SpanField.childCandidates(children.asInstanceOf[ArrayData],
      url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, u) =>
      s"graft.functions.SpanField.childCandidates($a, $u)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChildCandidates =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "child_candidates"
}

object SpanFieldColumns {
  def spanTextJoin(spans: Column): Column =
    ColumnBridge.column(SpanTextJoin(ColumnBridge.expression(spans)))

  def spanTextLength(spans: Column): Column =
    ColumnBridge.column(SpanTextLength(ColumnBridge.expression(spans)))

  def childCandidates(children: Column, url: Column): Column =
    ColumnBridge.column(ChildCandidates(
      ColumnBridge.expression(children), ColumnBridge.expression(url)))
}
