package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit rolling hash over a string's UTF-8 bytes — document
  * fingerprinting for dedup pipelines (SURVEY.md §7: LLM-extension
  * operators; no reference counterpart).
  *
  * A native Catalyst `Expression` with `doGenCode`, not a Scala UDF: the
  * generated Java participates in whole-stage codegen, so fingerprinting a
  * 100 TB corpus stays inside the same generated loop as the parquet scan —
  * no boxing, no SerDe, no codegen fence.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = RollingHash64.Offset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * RollingHash64.Prime
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${RollingHash64.Offset}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * ${RollingHash64.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash64 {
  private[functions] val Offset = -3750763034362895579L // FNV-1a 64 offset basis
  private[functions] val Prime = 1099511628211L         // FNV-1a 64 prime

  /** Column API: `rolling_hash64($"text")`. */
  def rolling_hash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      RollingHash64(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Make `rolling_hash64(...)` callable from SQL text in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "rolling_hash64", exprs => RollingHash64(exprs.head))
}
