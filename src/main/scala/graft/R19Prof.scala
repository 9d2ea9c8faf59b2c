package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 optimization-round stage profiler (dev tool) —
  * `sbt "runMain graft.R19Prof <section>"`. Sections overlap upstream
  * work (lazy recompute); read deltas.
  */
object R19Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"R19PROF $n ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val section = args.headOption.getOrElse("emb")
    section match {
      case "emb" =>
        val emb = Tables.load(spark, dir, "embeddings")
        emb.count()
        t("mllib_brp_join") {
          println("found=" + llm.MlLsh.embeddingPairsMl(emb, maxL2 = 1.15)
            .select(col("a_id"), col("b_id")).count())
        }
        val thrM = 1322500L
        val e = emb.select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))").as("vd"))
          .withColumn("norm_m",
            graft.functions.ScaledDotMicros.scaled_dot_micros(col("vd"), col("vd")))
        def sqJoin(pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = pairs
          .join(e.select(col("vec_id").as("a_id"), col("vd").as("a_vd"),
            col("norm_m").as("a_norm")), "a_id")
          .join(e.select(col("vec_id").as("b_id"), col("vd").as("b_vd"),
            col("norm_m").as("b_norm")), "b_id")
          .withColumn("sq_m",
            col("a_norm") + col("b_norm") -
              lit(2L) * graft.functions.ScaledDotMicros.scaled_dot_micros(col("a_vd"), col("b_vd")))
          .select(pairs.columns.toIndexedSeq.map(col) :+ col("sq_m"): _*)
        t("exact_n2_pairs") {
          println("true=" + sqJoin(
              e.select(col("vec_id").as("a_id"))
                .join(e.select(col("vec_id").as("b_id")), col("a_id") < col("b_id")))
            .filter(col("sq_m") <= thrM).count())
        }
        t("whole_query_1") {
          SparkEntry.queries("llm_embedding_pairs_ml")(spark, dir).count()
        }
        t("whole_query_2") {
          SparkEntry.queries("llm_embedding_pairs_ml")(spark, dir).count()
        }
      case "brpcand" =>
        val emb = Tables.load(spark, dir, "embeddings")
        val vec = emb.select(col("vec_id"),
          org.apache.spark.ml.functions.array_to_vector(
            expr("transform(embedding, x -> cast(x as double))")).as("features"))
        val model = new org.apache.spark.ml.feature.BucketedRandomProjectionLSH()
          .setInputCol("features").setOutputCol("hashes")
          .setBucketLength(0.5).setNumHashTables(4).setSeed(42)
          .fit(vec)
        val hashed = model.transform(vec)
        val expl = hashed.select(col("vec_id"),
          posexplode(col("hashes")).as(Seq("entry", "hv")))
          .select(col("vec_id"), col("entry"),
            org.apache.spark.ml.functions.vector_to_array(col("hv"))(0).as("bucket"))
        t("bucket_histogram") {
          expl.groupBy("entry", "bucket").count()
            .orderBy(desc("count")).show(20, false)
        }
        t("candidate_pairs_distinct") {
          val a = expl.select(col("vec_id").as("a_id"), col("entry"), col("bucket"))
          val b = expl.select(col("vec_id").as("b_id"), col("entry"), col("bucket"))
          println("cand=" + a.join(b, Seq("entry", "bucket"))
            .filter(col("a_id") < col("b_id"))
            .select("a_id", "b_id").distinct().count())
        }
      case "cluster" =>
        val docs = Tables.load(spark, dir, "documents")
          .filter(col("doc_id") < 1000)
        SparkEntry.queries("llm_dedup_cluster_stats")(spark, dir).count() // warm
        t("prefix_pairs") {
          println("pairs=" + llm.Dedup.prefixFilteredJaccardPairs(docs, 500000L).count())
        }
        t("whole_cluster_stats") {
          SparkEntry.queries("llm_dedup_cluster_stats")(spark, dir).count()
        }
        t("components_q") {
          SparkEntry.queries("op_graph_components")(spark, dir).count()
        }
        t("components_q_2") {
          SparkEntry.queries("op_graph_components")(spark, dir).count()
        }
      case "rep3" =>
        val q = args(1)
        SparkEntry.queries(q)(spark, dir).count() // warm
        (1 to 3).foreach { r =>
          t(s"${q}_$r") { SparkEntry.queries(q)(spark, dir).count() }
        }
      case "finalplan" =>
        val q = args(1)
        val df = SparkEntry.queries(q)(spark, dir)
        df.count()
        println("=== FINAL ADAPTIVE PLAN " + q + " ===")
        println(df.queryExecution.executedPlan.toString.take(8000))
      case "shingle_micro" =>
        val docs = Tables.load(spark, dir, "documents")
        docs.count() // warm the scan
        val hof =
          """array_distinct(flatten(transform(array(split(text, ' ')), w ->
            |  CASE WHEN size(w) >= 3
            |       THEN transform(sequence(1, size(w) - 2),
            |            i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
            |       ELSE array(text) END)))""".stripMargin
        (1 to 3).foreach { r =>
          t(s"hof_$r") {
            docs.select(expr(s"sum(size($hof))")).collect()
          }
          t(s"expr_$r") {
            docs.select(sum(size(
              graft.functions.WordShingles.word_shingles(col("text"))))).collect()
          }
        }
      case "minhash" =>
        t("whole_minhash_1") {
          SparkEntry.queries("llm_dedup_minhash")(spark, dir).count()
        }
        t("whole_minhash_2") {
          SparkEntry.queries("llm_dedup_minhash")(spark, dir).count()
        }
      case "profile" =>
        t("profile_table_1") {
          SparkEntry.queries("op_profile_table")(spark, dir).count()
        }
        t("profile_table_2") {
          SparkEntry.queries("op_profile_table")(spark, dir).count()
        }
        t("profile_table_approx") {
          SparkEntry.queries("op_profile_table_approx")(spark, dir).count()
        }
      case q =>
        t(q + "_1") { SparkEntry.queries(q)(spark, dir).count() }
        t(q + "_2") { SparkEntry.queries(q)(spark, dir).count() }
    }
    spark.stop()
  }
}
