package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.GraftBridge

import graft.core.PkgVersion

/** Static entry points for generated code (a plain object with no
  * companion class gets JVM static forwarders, so codegen can call
  * `graft.functions.VersionOps.cmp(...)` directly). */
object VersionOps {
  def cmp(a: String, b: String): Int = PkgVersion.compareRaw(a, b)
}

/** `version_cmp(a, b)` as a native Catalyst expression.
  *
  * dpkg ordering (graft.core.PkgVersion; reference semantics
  * /root/reference/common/version.go:148-315) is not expressible with
  * built-ins, but as a BinaryExpression with a one-call doGenCode it
  * stays inside whole-stage codegen instead of forcing the
  * UDF-boundary serialization a ScalaUDF would. */
case class VersionCmp(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    VersionOps.cmp(a.toString, b.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VersionOps.cmp($a.toString(), $b.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VersionCmp =
    copy(left = l, right = r)
  override def prettyName: String = "version_cmp"
}

object VersionExpressions {
  /** Column API: version_cmp(a, b) -> -1/0/1. */
  def version_cmp(a: Column, b: Column): Column =
    GraftBridge.column(
      VersionCmp(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register `version_cmp` for SQL use on this session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "version_cmp", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"version_cmp requires exactly 2 arguments, got ${exprs.length}")
        VersionCmp(exprs(0), exprs(1))
      }, "built-in")
  }
}
