package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared euclidean distance over two `array<double>` columns —
  * bit-identical to MLlib's `Vectors.sqdist(dense, dense)`: an
  * ascending-index left fold `acc += (aᵢ − bᵢ)²` in plain double
  * arithmetic (same IEEE operation sequence, so `sqrt(sq_dist_double)`
  * reproduces `BucketedRandomProjectionLSHModel.keyDistance` exactly —
  * MlLshSpec pins this against `approxSimilarityJoin`).
  *
  * A native Catalyst `Expression` with `doGenCode`, for the same reason
  * as [[ScaledDotMicros]]: the `aggregate(zip_with(…))` HOF formulation
  * allocates an intermediate array and pays two interpreted lambda
  * evaluations per element OUTSIDE whole-stage codegen; this compiles to
  * a bare subtract-multiply-accumulate loop inside the stage.
  *
  * NULL if either array is NULL, if lengths differ, or if any element is
  * NULL (mirroring the HOF/zip_with semantics).
  */
case class SqDistDouble(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist_double"
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
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val d = aa.getDouble(i) - bb.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0D;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistDouble {

  /** Column API: `sq_dist_double($"a", $"b")`. */
  def sq_dist_double(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SqDistDouble(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
