package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel for the funnel fold. Same rationale as [[TextKernel]]:
  * the SQL `aggregate` higher-order form is CodegenFallback — it evaluates
  * interpreted with boxed lambdas per event, and (measured on the 4M-hot-
  * user probe) its interpreter call sites degrade JVM-wide once several
  * distinct HOF lambdas have run in the session. This loop produces
  * value-identical transition vectors (locked by the funnel property specs
  * and the DuckDB oracles) inside whole-stage codegen.
  */
object EventKernel {

  /** k parallel greedy funnel walks over a (us, et)-sorted event array:
    * walk j enters with j steps completed; an event advances walk j iff it
    * is the walk's NEXT step and strictly later than the walk's last
    * match. Returns F with F(j) = steps completed on exit — exactly the
    * transition-vector semantics of
    * [[graft.ops.EventOps.funnelBucketed]]'s declarative fold (a
    * null-fielded event advances nothing, as the SQL `when`'s
    * null-condition → otherwise branch does).
    */
  def funnelTransitions(evs: ArrayData, steps: Array[UTF8String]): ArrayData = {
    val k = steps.length
    val c = Array.tabulate(k)(j => j)
    val t = Array.fill(k)(Long.MinValue)
    val n = evs.numElements()
    var i = 0
    while (i < n) {
      val row = evs.getStruct(i, 2)
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val us = row.getLong(0)
        val et = row.getUTF8String(1)
        var j = 0
        while (j < k) {
          if (c(j) < k && us > t(j) && et.equals(steps(c(j)))) {
            c(j) += 1
            t(j) = us
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(c)
  }
}

/** sorted `array<struct<us: long, et: string>>` → `array<int>` funnel
  * transition vector (F(j) = completed count when entering with j).
  */
case class FunnelTransitions(child: Expression, steps: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val stepsU: Array[UTF8String] =
    steps.map(UTF8String.fromString).toArray

  override def nullSafeEval(v: Any): Any =
    EventKernel.funnelTransitions(v.asInstanceOf[ArrayData], stepsU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // RAW array type: see the LexiconCounts note on Janino generics
    val stepsRef = ctx.addReferenceObj("funnelSteps", stepsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EventKernel.funnelTransitions($c, $stepsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): FunnelTransitions =
    copy(child = newChild)
  override def prettyName: String = "funnel_transitions"
}

object EventExpressions {
  /** sorted (us, et) struct array → funnel transition vector, codegen. */
  def funnelTransitions(evs: Column, steps: Seq[String]): Column =
    ColumnBridge.column(FunnelTransitions(ColumnBridge.expression(evs), steps))
}
