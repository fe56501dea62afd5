package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge

import graft.core.{Model, PkgVersion}

/** Static entry points for generated code (a plain object with no
  * companion class gets JVM static forwarders, so codegen can call
  * `graft.functions.VersionOps.cmp(...)` directly). */
object VersionOps {
  def cmp(a: String, b: String): Int = PkgVersion.compareRaw(a, b)
  def valid(s: UTF8String): Boolean = PkgVersion.parse(s.toString).isRight
  def cveYear(s: UTF8String): Int = Model.cveYear(s.toString)
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

/** `version_valid(s)` -> does the string parse as a dpkg version.
  * The validity gates in the feed adapters sit in filter position, so
  * this stays codegen'd where a UDF would box every row. */
case class VersionValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    VersionOps.valid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VersionOps.valid($c)")
  override protected def withNewChildInternal(newChild: Expression): VersionValid =
    copy(child = newChild)
  override def prettyName: String = "version_valid"
}

/** `cve_year(s)` -> leading-digit year of a CVE suffix, -1 when there
  * is none (reference common/db.go:63-70); the P1 year floor runs in
  * filter position. */
case class CveYearExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    VersionOps.cveYear(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VersionOps.cveYear($c)")
  override protected def withNewChildInternal(newChild: Expression): CveYearExpr =
    copy(child = newChild)
  override def prettyName: String = "cve_year"
}

object VersionExpressions {
  /** Column API: version_cmp(a, b) -> -1/0/1. */
  def version_cmp(a: Column, b: Column): Column =
    GraftBridge.column(
      VersionCmp(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: version_valid(s). */
  def version_valid(s: Column): Column =
    GraftBridge.column(VersionValid(GraftBridge.expression(s)))

  /** Column API: cve_year(s). */
  def cve_year(s: Column): Column =
    GraftBridge.column(CveYearExpr(GraftBridge.expression(s)))

  /** Register the version-family expressions for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "version_cmp", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"version_cmp requires exactly 2 arguments, got ${exprs.length}")
        VersionCmp(exprs(0), exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "version_valid", exprs => {
        require(exprs.length == 1, s"version_valid requires 1 argument, got ${exprs.length}")
        VersionValid(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cve_year", exprs => {
        require(exprs.length == 1, s"cve_year requires 1 argument, got ${exprs.length}")
        CveYearExpr(exprs.head)
      }, "built-in")
  }
}
