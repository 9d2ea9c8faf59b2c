package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** MinHash signature over a shingle array: `numHashes` universal-hash
  * permutations h_j(x) = (2j+1)·x + j·2654435761 mod p (p = first prime
  * past 2³²) over murmur3 shingle hashes, minimized per document —
  * [[graft.llm.Dedup.minHashSignatures]].
  *
  * Per-ROW native expression replacing the explode → groupBy(32 MIN aggs)
  * → join-back pipeline: the signature needs only the document's own
  * shingles, so computing it inside the row scan removes BOTH shuffles
  * (the exploded-shingle aggregation and the signature join) — at 100 TB
  * that is the difference between a zero-shuffle map stage and shuffling
  * one row per (doc × shingle). The shingle hash is the same
  * `Murmur3_x86_32.hashUnsafeBytes(..., 42)` Spark's `hash()` uses, with
  * the same cast-to-long + abs, so signatures are bit-identical to the
  * aggregate formulation (gated by DedupSpec's equivalence test).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName numHashes must be >= 1")
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // a doc with no shingles has no signature
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      if (arr.isNullAt(t)) return null
      val s = arr.getUTF8String(t)
      val h = math.abs(Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong)
      var j = 0
      while (j < numHashes) {
        val v = ((2L * j + 1) * h + j * 2654435761L) % MinHashSig.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n && !${ev.isNull}; $t++) {
         |  if ($c.isNullAt($t)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($t);
         |  long $h = Math.abs((long) org.apache.spark.unsafe.hash.Murmur3_x86_32
         |    .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42));
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ((2L * $j + 1) * $h + $j * 2654435761L) % ${MinHashSig.P}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Smallest prime > 2³² — the permutation modulus. */
  val P = 4294967311L

  /** Column API: `minhash_sig($"shingles", 32)`. */
  def minhash_sig(c: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSig(org.apache.spark.sql.GraftBridge.expression(c), numHashes))

  /** Make `minhash_sig(shingles, n)` callable from SQL text (n must be an
    * integer literal).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "minhash_sig", exprs => MinHashSig(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new graft.UnsupportedError(
          s"minhash_sig numHashes must be an integer literal, got $other")
      }))
}
