package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.UrlOps

/** Custom Catalyst expressions for the frontier hot path (F13).
  *
  * The first formulation of URL canonicalization composed six regexp
  * built-ins; profiling the frontier bench showed it dominating round CPU
  * (~8s of a 13s round at 16M URLs). This single-pass expression calls the
  * same static function the driver-side code and the parity Oracle use —
  * one implementation, so engine/oracle agreement holds by construction —
  * and participates in whole-stage codegen via [[doGenCode]] (preference
  * order (b) in SURVEY.md §7.4: a codegen Expression beats a Scala UDF).
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlOps.canonicalize(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.model.UrlOps.canonicalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)

  override def prettyName: String = "canonicalize_url"
}

/** Host of a canonical URL — same single-implementation pattern. */
case class HostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlOps.host(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.model.UrlOps.host($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HostOf =
    copy(child = newChild)

  override def prettyName: String = "url_host"
}

object UrlExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def canonicalizeUrl(c: Column): Column =
    ColumnBridge.column(CanonicalizeUrl(ColumnBridge.expression(c)))
  def urlHost(c: Column): Column =
    ColumnBridge.column(HostOf(ColumnBridge.expression(c)))

  /** optional SQL registration: canonicalize_url(url), url_host(url). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonicalize_url", exprs => CanonicalizeUrl(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_host", exprs => HostOf(exprs.head), "scala_udf")
  }
}
