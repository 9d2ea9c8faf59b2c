package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native AS-OF join operator (custom LogicalPlan + Strategy +
  * SparkPlan): semantics pinned against the composed union+window form,
  * the physical plan pinned to the streaming-merge shape.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def composed(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    graft.ops.Relational.asOfJoin(l, r, "k", "t", "rt")
      .select(col("k"), col("t"), col("v"))

  private def native(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOfJoin(l, r, "k", "t", "rt")
      .select(col("k"), col("t"), col("v"))

  test("native as-of join equals the composed union+window form") {
    initLog()
    // deterministic pseudo-random fixture: keys with dense/sparse/missing
    // right sides, duplicate left timestamps, exact-tie timestamps
    val left = (1 to 500).map { i =>
      (i % 13L, (i * 2654435761L % 97L) * 10L)
    }.toDF("k", "t")
    val right = (1 to 200).map { i =>
      val k = i % 9L // keys 9..12 have NO right rows
      (k, (i * 40503L % 97L) * 10L, s"v$i")
    }.toDF("k", "rt", "v")
      .groupBy("k", "rt").agg(max("v").as("v")) // unique per (k, rt)
    val a = composed(left, right)
    val b = native(left, right.repartition(7)) // layout must not matter
    assert(a.count() === 500 && b.count() === 500)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"divergence: ${a.exceptAll(b).take(3).mkString(";")} | ${b.exceptAll(a).take(3).mkString(";")}")
  }

  test("left rows before any right row get NULLs; exact ties match") {
    val left = Seq((1L, 5L), (1L, 10L), (1L, 20L), (2L, 100L)).toDF("k", "t")
    val right = Seq((1L, 10L, "at10"), (1L, 15L, "at15")).toDF("k", "rt", "v")
    val got = AsOfJoin.asOfJoin(left, right, "k", "t", "rt")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).orNull))
    assert(got.toSeq === Seq(
      (1L, 5L, null),      // before any right row
      (1L, 10L, "at10"),   // exact tie matches (<=)
      (1L, 20L, "at15"),   // latest prior
      (2L, 100L, null)))   // key with no right rows at all
  }

  test("physical plan is the streaming merge: AsOfJoinExec, no window, no SMJ") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 1L, "x")).toDF("k", "rt", "v")
    val plan = AsOfJoin.asOfJoin(left, right, "k", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing:\n$plan")
    assert(!plan.contains("Window"), "window machinery leaked into the native plan")
    assert(!plan.contains("SortMergeJoin"), "unexpected SMJ in the native plan")
  }
}
