package graft.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, BucketedRandomProjectionLSH}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** spark.ml-backed LSH variants (SURVEY.md §7.3: "near dedup:
  * spark.ml MinHashLSH; similarity: BucketedRandomProjectionLSH") —
  * complementing the hand-rolled [[Dedup.minHashDedup]] /
  * [[Similarity.lshTopK]] with the MLlib estimator/transformer pipeline:
  * HashingTF shingle vectors → fitted LSH model → approxSimilarityJoin.
  * Seeded, so results are reproducible; candidate generation is MLlib's
  * banded join (same Σ bucket² bound as the custom path).
  */
object MlLsh {

  /** Shingle-set vectors for LSH: sparse HashingTF (binary) over word
    * 3-gram shingles.
    */
  private def shingleVectors(docs: DataFrame, numFeatures: Int = 1 << 18): DataFrame = {
    val sh = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
    new HashingTF()
      .setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
      .transform(sh)
  }

  /** Near-duplicate pairs via spark.ml MinHashLSH approxSimilarityJoin.
    * `maxJaccardDistance` = 1 − jaccard threshold.
    */
  def minHashPairsMl(docs: DataFrame, maxJaccardDistance: Double = 0.3,
      numHashTables: Int = 4): DataFrame = {
    val vec = shingleVectors(docs)
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42)
      .fit(vec)
    model.approxSimilarityJoin(vec, vec, maxJaccardDistance, "dist")
      .select(col("datasetA.doc_id").as("a_id"), col("datasetB.doc_id").as("b_id"),
        (lit(1.0) - col("dist")).as("jaccard_est"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding near-neighbor pairs via BucketedRandomProjectionLSH
    * (euclidean buckets) — spark.ml's scale path for similarity join.
    */
  def embeddingPairsMl(embeddings: DataFrame, maxL2: Double,
      bucketLength: Double = 0.5, numHashTables: Int = 4): DataFrame = {
    // spark.ml ships this conversion (array_to_vector) — null-safe, no
    // hand-rolled closure UDF that would NPE on a NULL embedding row
    val vec = embeddings.select(col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        expr("transform(embedding, x -> cast(x as double))")).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42)
      .fit(vec)
    model.approxSimilarityJoin(vec, vec, maxL2, "l2")
      .select(col("datasetA.vec_id").as("a_id"), col("datasetB.vec_id").as("b_id"), col("l2"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
  }
}
