package graft

/** MinHash pipeline stage profiler (dev tool) — `sbt "runMain graft.Prof"`.
  * Stage timings overlap (each count recomputes upstream lazily); read
  * deltas, and full_dedup as the end-to-end number.
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"PROF $n ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val sh = t("shingles"){ val d = llm.Dedup.withShingles(docs); d.count(); d }
    val sig = t("signatures"){ val d = llm.Dedup.minHashSignatures(sh); d.count(); d }
    val banded = t("bands"){ val d = llm.Dedup.lshBands(sig); d.count(); d }
    val pairs = t("candidate_pairs"){ val d = llm.Dedup.minHashCandidatePairs(banded, sh); println("pairs=" + d.count()); d }
    t("full_dedup"){ llm.Dedup.minHashDedup(docs).count() }
    // the driver gate = full dedup + structural checks + independent
    // HOF signature recomputation; its delta over full_dedup is the
    // price of the dual-path verification
    t("gate_query"){
      llm.LlmQueries.dedupMinHash.fn(spark, "/root/testdata/sf0.1").count()
    }
    spark.stop()
  }
}
