package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003) of a
  * string: the distinct minima of every `w`-window over the Horner
  * base-31 hashes of all `k`-code-point grams — the per-document half of
  * [[graft.llm.Dedup.winnowedOverlapPairs]].
  *
  * A native Catalyst `Expression` because the HOF formulation
  * (`transform(sequence…)` + `aggregate` + `slice`/`array_min`) is
  * O(len·k) substring calls for the grams plus O(len·w) for the window
  * minima, with an array allocation per character; this expression is
  * ONE O(len) pass — rolling Horner update (subtract the outgoing code
  * point times 31^(k−1), multiply, add the incoming one; 2⁶⁴ wraparound
  * makes it bit-equal to the direct fold) and a monotonic deque for the
  * sliding minimum. Same integers, so the DuckDB oracle that replays the
  * direct fold is unchanged (FunctionsSpec pins expression ≡ HOF).
  * Uncapped, the HOF version was the single most expensive stage of the
  * whole sf0.1 bench.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 2, "need k >= 2 and w >= 2")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fps(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.WinnowFingerprints.fps($c.toString(), $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Distinct window minima in first-occurrence order; empty array when
    * the string has fewer than k+w−1 code points (no full window).
    */
  def fps(s: String, k: Int, w: Int): ArrayData = {
    val n = s.codePointCount(0, s.length)
    val m = n - k + 1 // gram count
    if (m < w) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var i = 0
    var idx = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(idx) = cp
      idx += 1
      i += Character.charCount(cp)
    }
    var pow = 1L // 31^(k-1), wrapping — matches the repeated-multiply fold
    var j = 0
    while (j < k - 1) { pow *= 31L; j += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < k) { h = h * 31L + cps(j); j += 1 }
    hs(0) = h
    j = 1
    while (j < m) {
      h = (h - cps(j - 1) * pow) * 31L + cps(j + k - 1)
      hs(j) = h
      j += 1
    }
    // sliding-window minimum via monotonic deque; ties keep the earliest
    // index, which cannot change the min VALUE the window reports
    val deque = new java.util.ArrayDeque[Integer]()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var q = 0
    while (q < m) {
      while (!deque.isEmpty && hs(deque.peekLast) >= hs(q)) deque.pollLast()
      deque.addLast(q)
      if (deque.peekFirst <= q - w) deque.pollFirst()
      if (q >= w - 1) seen.add(hs(deque.peekFirst))
      q += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** Column API: `winnow_fps($"text", k, w)`. */
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WinnowFingerprints(org.apache.spark.sql.GraftBridge.expression(c), k, w))
}
