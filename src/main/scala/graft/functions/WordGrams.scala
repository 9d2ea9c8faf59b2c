package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL word n-grams (duplicates kept, corpus order) of a
  * single-space-tokenized string — the per-document half of the bigram
  * histogram operators ([[graft.llm.TextAnalysis.bigramNovelty]] /
  * `bigramRepetition`).
  *
  * Bit-equal to the builtin-HOF formulation
  * `flatten(transform(array(split(text, ' ')), w ->
  * transform(sequence(1, greatest(size(w) − (n−1), 1)),
  * i -> concat_ws(' ', slice(w, i, n)))))`, which the DuckDB oracles
  * replay: with single-space tokenization each gram is EXACTLY the byte
  * span of the original string from token i's start to the end of token
  * min(i+n−1, last) (`slice` past the end just truncates, which
  * `concat_ws` joins shorter — the sub-n-token tail rule for short
  * documents). Same zero-copy byte-slice construction and same
  * rationale as [[WordShingles]]; FunctionsSpec pins expression ≡ HOF.
  */
case class WordGrams(child: Expression, n: Int, floorOne: Boolean)
    extends UnaryExpression {
  require(n >= 2, "need n >= 2")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WordGrams.grams(input.asInstanceOf[UTF8String], n, floorOne)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.WordGrams.grams($c, $n, $floorOne);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {

  def grams(s: UTF8String, n: Int, floorOne: Boolean): ArrayData = {
    val b = s.getBytes
    val len = b.length
    var spaces = 0
    var i = 0
    while (i < len) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val tokens = spaces + 1
    val starts = new Array[Int](tokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (b(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    // gram count: one per window start. floorOne floors it at 1 (short
    // docs emit their whole remaining tail — the `slice`-truncation
    // semantics of the histogram operators); strict mode emits NOTHING
    // below n tokens (the `zip_with`-over-shifted-slices semantics of
    // the LM/census operators).
    val m0 = tokens - (n - 1)
    if (!floorOne && m0 < 1) return new GenericArrayData(Array.empty[Any])
    val m = math.max(m0, 1)
    val arr = new Array[Any](m)
    var k = 0
    while (k < m) {
      val from = starts(k)
      val lastTok = math.min(k + n - 1, tokens - 1)
      val until = if (lastTok + 1 < tokens) starts(lastTok + 1) - 1 else len
      arr(k) = UTF8String.fromBytes(b, from, until - from)
      k += 1
    }
    new GenericArrayData(arr)
  }

  /** Column API: `word_grams($"text", n)` — short docs yield one
    * whole-tail gram (the histogram operators' rule).
    */
  def word_grams(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordGrams(org.apache.spark.sql.GraftBridge.expression(c), n, floorOne = true))

  /** Strict variant: documents with fewer than n tokens yield an EMPTY
    * array (the `zip_with(slice, slice)` rule of the LM/census operators).
    */
  def word_grams_strict(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordGrams(org.apache.spark.sql.GraftBridge.expression(c), n, floorOne = false))
}
