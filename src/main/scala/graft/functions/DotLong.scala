package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product over two `array<bigint>` columns:
  * Σ xᵢ·yᵢ as BIGINT — the hot loop of the quantized ANN tiers
  * (SQ8 ranking, PQ query-to-centroid tables).
  *
  * A native Catalyst `Expression` with `doGenCode` replacing the
  * interpreted `aggregate(zip_with(x·y))` higher-order pipeline, for the
  * same reason as [[ScaledDotMicros]]: the HOF path allocates an
  * intermediate zipped array and pays two interpreted lambda evaluations
  * per element OUTSIDE whole-stage codegen; this compiles to a bare
  * multiply-accumulate loop inside the stage. Same integers (64-bit
  * wraparound multiply/add both ways), so results are bit-identical and
  * the DuckDB oracles are unchanged (FunctionsSpec pins expression ≡ HOF).
  *
  * NULL if either array is NULL, if lengths differ, or if any element is
  * NULL (zip_with pads the shorter array with NULL and `acc + NULL` is
  * NULL, so the HOF formulation nulls out in exactly these cases).
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> inputs, got ${left.dataType.sql} and ${right.dataType.sql}")
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
      acc += aa.getLong(i) * bb.getLong(i)
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
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotLong {

  /** Column API: `dot_long($"a", $"b")`. */
  def dot_long(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DotLong(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
