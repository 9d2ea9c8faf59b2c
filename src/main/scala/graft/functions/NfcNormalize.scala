package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the first step of every text-curation
  * normalizer (CCNet/Gopher-style pipelines canonicalize before hashing,
  * otherwise "café" composed and decomposed fingerprint differently and
  * dedup silently misses; SURVEY.md §7 LLM extensions, no reference
  * counterpart).
  *
  * A native Catalyst `Expression` with `doGenCode` rather than a UDF so a
  * corpus-wide normalize pass stays inside whole-stage codegen with the
  * scan. The JDK's `java.text.Normalizer` implements Unicode NFC (same
  * canonical-composition tables as DuckDB's utf8proc, so results oracle
  * exactly). All-ASCII strings — the overwhelming majority of real corpus
  * bytes — take an O(n) byte-scan fast path that skips the
  * char-conversion round trip entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (NfcNormalize.isAscii(s)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if (graft.functions.NfcNormalize.isAscii($c)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** True iff every byte is < 0x80 (pure ASCII ⇒ already NFC). */
  def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Column API: `nfc_normalize($"text")`. */
  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Make `nfc_normalize(...)` callable from SQL text in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "nfc_normalize", exprs => NfcNormalize(exprs.head))
}
