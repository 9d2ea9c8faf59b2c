package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact scaled-integer dot product over two `array<double>` columns:
  * Σ ⌊xᵢ·yᵢ·10⁶⌋ as BIGINT — the quantized-but-bit-reproducible inner
  * product the similarity tier is built on ([[graft.llm.Similarity]]).
  *
  * A native Catalyst `Expression` with `doGenCode` replacing the
  * interpreted `aggregate(zip_with(…))` higher-order pipeline: the HOF
  * path allocates an intermediate zipped array and evaluates two lambdas
  * per element outside whole-stage codegen; this compiles to a bare fused
  * multiply-floor-accumulate loop inside the stage — the difference
  * between scanning 10⁹ embeddings inside one generated loop and paying a
  * per-row interpreter fence.
  *
  * Semantics mirror the HOF formulation exactly (so the DuckDB oracles
  * are unchanged): NULL if either array is NULL, if lengths differ
  * (zip_with pads with NULL), or if any element is NULL.
  */
case class ScaledDotMicros(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "scaled_dot_micros"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> inputs, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      acc += math.floor(aa.getDouble(i) * bb.getDouble(i) * 1.0e6).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) java.lang.Math.floor($a.getDouble($i) * $b.getDouble($i) * 1.0E6D);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ScaledDotMicros {

  /** Column API: `scaled_dot_micros($"a", $"b")`. */
  def scaled_dot_micros(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ScaledDotMicros(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Make `scaled_dot_micros(...)` callable from SQL text in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "scaled_dot_micros", exprs => ScaledDotMicros(exprs(0), exprs(1)))
}
