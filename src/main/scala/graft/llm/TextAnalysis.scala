package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.RollingHash64.rolling_hash64

/** Text analysis for training-data pipelines: token statistics, language
  * identification, quality scoring, fingerprinting (north-star extensions,
  * BASELINE.json). All per-row column expressions — no shuffle, fully
  * parallel at any scale; scores are exact-integer arithmetic so results
  * are engine- and order-independent.
  */
object TextAnalysis {

  /** Token/character statistics: token count, distinct-token count, char
    * count, exact average word length.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("w", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(col("w"))).cast("long"))
      .withColumn("n_chars_m", length(col(textCol)).cast("long"))
      .withColumn("avg_word_len",
        expr("aggregate(w, 0L, (acc, t) -> acc + length(t))").cast("double") / col("n_tokens"))
      .drop("w")

  /** Tiny per-language stopword lexicons for the n-gram/stopword heuristic
    * language id. Deliberately small — the operator shape (score per
    * language, argmax) is what scales, the lexicon is a parameter.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "que"))

  /** Language id: per-language stopword hit counts (exact integers) and
    * argmax with a deterministic tie-break (alphabetical language order,
    * `und` = undetermined when every score is zero).
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = stopwords.toSeq.sortBy(_._1).foldLeft(
      docs.withColumn("w", split(col(textCol), " "))) {
      case (df, (lang, words)) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        df.withColumn(s"score_$lang",
          expr(s"size(filter(w, t -> t IN ($list)))").cast("long"))
    }
    val langs = stopwords.keys.toSeq.sorted
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    // earlier (alphabetical) language wins ties; all-zero scores → "und"
    val predFirst = langs.foldLeft(lit(null).cast("string")) { (acc, l) =>
      coalesce(acc, when(col(s"score_$l") === best && best > 0, lit(l)))
    }
    scored
      .withColumn("predicted_lang", coalesce(predFirst, lit("und")))
      .drop("w")
  }

  /** Quality score in [0,1]: weighted blend of length saturation,
    * stopword ratio, and lexical diversity — all from exact integer counts,
    * one deterministic double expression.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val en = stopwords("en").map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("w", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_stop", expr(s"size(filter(w, t -> t IN ($en)))").cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
      .withColumn("quality",
        least(col("n_tokens").cast("double") / 100, lit(1.0)) * 0.4 +
          (col("n_stop").cast("double") / col("n_tokens")) * 0.3 +
          (col("n_distinct").cast("double") / col("n_tokens")) * 0.3)
      .drop("w")
  }

  /** Content fingerprints: md5 digest (cross-engine oracle-able) and the
    * codegen'd FNV-1a rolling hash ([[graft.functions.RollingHash64]]).
    */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("md5_fp", md5(col(textCol)))
      .withColumn("rolling_fp", rolling_hash64(col(textCol)))
}
