package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash fingerprint over a token array: each token hashed with
  * Spark's xxhash64 (XXH64, seed 42); bit i of the fingerprint is the sign
  * of Σ_tokens (±1 by the token's bit i) — [[graft.llm.Dedup.simHash]].
  *
  * Native `doGenCode` replacement for the previous two-stage HOF fold,
  * which allocated a fresh 64-element votes array per TOKEN
  * (`aggregate(..., zip_with(acc, sequence(0,63), ...))`) in interpreted
  * mode. Here the votes live in one stack `int[64]` per row and the token
  * hash is the same `XXH64.hashUTF8String(t, 42)` the builtin uses, so
  * fingerprints are bit-identical. NULL array or NULL token → NULL
  * (mirroring NULL propagation through the old fold).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (arr.isNullAt(t)) return null
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(arr.getUTF8String(t), 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[64];
         |for (int $t = 0; $t < $n && !${ev.isNull}; $t++) {
         |  if ($c.isNullAt($t)) { ${ev.isNull} = true; break; }
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUTF8String($c.getUTF8String($t), 42L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $fp = 0L;
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ($votes[$i] > 0) $fp |= (1L << $i);
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Builtin-only SQL recomputation of the same fingerprint — an
    * INDEPENDENT second implementation (xxhash64 + aggregate/zip_with
    * majority vote, the pre-codegen HOF fold) used by self-check gates
    * (`llm_dedup_simhash`, `stream_dedup_neardup`): XXH64 is not
    * expressible in DuckDB, so "two disjoint implementations agree per
    * row" is the verifiable substitute for an oracle replay. `shiftright`
    * is arithmetic where the codegen path shifts logically, but the two
    * agree on the masked low bit for every i in 0..63.
    */
  def referenceFoldSql(tokensExpr: String): String =
    s"""aggregate($tokensExpr, array_repeat(0, 64),
       |  (acc, t) -> zip_with(acc, sequence(0, 63),
       |    (v, i) -> v + IF((shiftright(xxhash64(t), CAST(i AS INT)) & 1L) = 1L, 1, -1)),
       |  acc -> aggregate(zip_with(acc, sequence(0, 63),
       |      (v, i) -> IF(v > 0, shiftleft(1L, CAST(i AS INT)), 0L)),
       |    0L, (a, x) -> a | x))""".stripMargin.replace("\n", " ")

  /** Column API: `simhash64(split($"text", " "))`. */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Make `simhash64(tokens)` callable from SQL text in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "simhash64", exprs => SimHash64(exprs.head))
}
