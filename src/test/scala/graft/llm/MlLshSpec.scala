package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** spark.ml LSH variants against ground truth on the driver corpus. */
class MlLshSpec extends SparkSpec {

  test("MinHashLSH (spark.ml) recall at sf0.01 vs exact-Jaccard ground truth") {
    initLog()
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val truth = Dedup.ngramJaccardPairs(docs, topK = 100000)
      .filter(col("jaccard") >= 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ml = MlLsh.minHashPairsMl(docs, maxJaccardDistance = 0.3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 20, s"corpus should contain planted near-dups, got ${truth.size}")
    val recalled = truth.count(ml.contains)
    info(f"sf0.01: ml recall ${recalled.toDouble / truth.size}%.3f over ${truth.size} truth pairs")
    assert(recalled.toDouble / truth.size >= 0.9,
      s"ml minhash recall $recalled/${truth.size}")
  }

  test("MinHashLSH (spark.ml) recall at sf0.1 — bench scale", graft.SlowTest) {
    initLog()
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val truth = Dedup.ngramJaccardPairs(docs, topK = 1000000)
      .filter(col("jaccard") >= 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ml = MlLsh.minHashPairsMl(docs, maxJaccardDistance = 0.3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 100, s"sf0.1 corpus should contain planted near-dups, got ${truth.size}")
    val recall = truth.count(ml.contains).toDouble / truth.size
    info(f"sf0.1: ml recall $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.9, f"ml minhash recall $recall%.3f at sf0.1")
  }

  test("BucketedRandomProjectionLSH returns verified close pairs only") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = MlLsh.embeddingPairsMl(emb, maxL2 = 1.2).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("l2") <= 1.2)) // join verifies distance
  }
}
