package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-trigram shingles of a single-space-tokenized string —
  * the per-document half of every shingle-based dedup operator
  * ([[graft.llm.Dedup.withShingles]]).
  *
  * Bit-equal to the builtin-HOF formulation
  * `array_distinct(flatten(transform(array(split(text, ' ')), w ->
  * CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2),
  * i -> concat_ws(' ', w[i], w[i+1], w[i+2])) ELSE array(text) END)))`,
  * which the DuckDB oracles replay: `split` on the literal single-space
  * pattern keeps empty tokens (leading/consecutive/trailing), so joining
  * three consecutive tokens with `' '` reproduces EXACTLY the byte span
  * of the original string from the first token's start to the third
  * token's end (a space byte never occurs inside a multi-byte UTF-8
  * sequence), and `array_distinct` keeps first occurrences in order.
  *
  * A native Catalyst `Expression` (FunctionsSpec pins expression ≡ HOF)
  * because the HOF chain is the hot inner loop of the whole dedup
  * family and runs OUTSIDE whole-stage codegen: per document it
  * materializes the split array, then per trigram pays three
  * `element_at` calls, a `concat_ws` allocation and two lambda
  * interpreter fences. This is one O(bytes) pass that scans for space
  * positions once and emits zero-copy byte-slice views of the input.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.WordShingles.shingles($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  /** Distinct trigram byte-slices in first-occurrence order; the whole
    * string as a singleton array when it has fewer than three tokens.
    */
  def shingles(s: UTF8String): ArrayData = {
    val b = s.getBytes // one defensive copy per document
    val n = b.length
    // token start offsets: 0 plus one past every 0x20 byte
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val tokens = spaces + 1
    if (tokens < 3) return new GenericArrayData(Array[Any](s))
    val starts = new Array[Int](tokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < n) {
      if (b(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    // trigram i spans [starts(i), end of token i+2) where a token's end
    // is one before the NEXT token's start (the separating space) or the
    // string end for the last token
    val out = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k + 2 < tokens) {
      val from = starts(k)
      val until = if (k + 3 < tokens) starts(k + 3) - 1 else n
      out.add(UTF8String.fromBytes(b, from, until - from))
      k += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** Column API: `word_shingles($"text")`. */
  def word_shingles(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordShingles(org.apache.spark.sql.GraftBridge.expression(c)))
}
