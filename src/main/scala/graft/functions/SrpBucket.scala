package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Sign-random-projection LSH bucket key over an `array<double>` embedding:
  * `planes` pseudo-random hyperplanes with deterministic ±1 Rademacher
  * weights derived from murmur3 of (plane, dimension); bucket = packed
  * sign bits ([[graft.llm.Similarity.srpBuckets]]).
  *
  * Native `doGenCode` replacement for the previous doubly-nested
  * `aggregate(transform(...aggregate(zip_with(...))))` formulation, which
  * evaluated four lambda closures and a `hash()` expression per
  * (plane × dimension) in interpreted mode. The math is bit-identical:
  * weights come from the same `Murmur3_x86_32.hashInt(p·7919 + i, 42)`
  * Spark's `hash()` uses (seed 42), parity via `& 1` ≡ `pmod(·,2)`, and
  * the per-plane sum accumulates in ascending dimension order — the same
  * FP order, hence the same signs and the same buckets.
  */
case class SrpBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // NULL input OR any NULL element
  override def prettyName: String = "srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if planes >= 1 && planes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName planes must be in [1, 63], got $planes")
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<double>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // a NULL element null-propagates to a NULL bucket — the behavior of
    // the HOF aggregate(zip_with(...)) formulation this expression must
    // stay bit-identical to (getDouble on a null slot would otherwise
    // read garbage and emit a WRONG non-null bucket)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val w = Murmur3_x86_32.hashInt(p * 7919 + j, 42)
        val x = arr.getDouble(j)
        acc += (if ((w & 1) == 0) x else -x)
        j += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      val k = ctx.freshName("k")
      s"""
         |int $n = $c.numElements();
         |long $bucket = 0L;
         |for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
         |  if ($c.isNullAt($k)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $acc = 0.0D;
         |    for (int $i = 0; $i < $n; $i++) {
         |      int $w = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt($p * 7919 + $i, 42);
         |      $acc += (($w & 1) == 0) ? $c.getDouble($i) : -$c.getDouble($i);
         |    }
         |    if ($acc > 0) $bucket |= (1L << $p);
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucket {

  /** Column API: `srp_bucket($"vd", planes)`. */
  def srp_bucket(c: Column, planes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      SrpBucket(org.apache.spark.sql.GraftBridge.expression(c), planes))

  /** Make `srp_bucket(vd, planes)` callable from SQL text (planes must be
    * an integer literal).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "srp_bucket", exprs => SrpBucket(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new graft.UnsupportedError(
          s"srp_bucket planes must be an integer literal, got $other")
      }))
}
