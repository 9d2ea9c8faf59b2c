package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 optimization-round profiler (dev tool, NOT in the bench path) —
  * `sbt "runMain graft.R20Prof <section>"`. Every timed block also
  * reports Spark job/stage/task counts via a listener, so per-round
  * scheduling overhead (the r19 verdict's 8-core-beats-32-core signal on
  * the iterative loops) is measured directly rather than inferred.
  */
object R20Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })
    def t[A](n: String)(f: => A): A = {
      val (j0, s0, k0) = (jobs, stages, tasks)
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"R20PROF $n $dt%.2f s  jobs=${jobs - j0} stages=${stages - s0} tasks=${tasks - k0}")
      r
    }
    def rep3(q: String): Unit = {
      SparkEntry.queries(q)(spark, dir).count() // warm
      (1 to 3).foreach(r => t(s"${q}_$r") { SparkEntry.queries(q)(spark, dir).count() })
    }

    args.headOption.getOrElse("loops") match {
      case "loops" =>
        Seq("op_graph_components", "op_graph_pagerank", "llm_bpe_learn",
          "llm_bpe_pipeline", "op_cooccurrence", "llm_dedup_cluster_stats")
          .foreach(rep3)
      case "lsh" =>
        Seq("llm_dedup_minhash_ml", "llm_embedding_pairs_ml").foreach(rep3)
      case "tail" =>
        Seq("q21_waiting_supplier", "op_histogram_equifreq", "llm_retrieval_rrf",
          "llm_mix_token_budget", "op_recursive_cte", "llm_text_keywords",
          "llm_dedup_winnow").foreach(rep3)
      case "minhash" =>
        // stage-by-stage breakdown of llm_dedup_minhash (verdict r19 #3)
        val docsF = Tables.load(spark, dir, "documents")
        docsF.count() // warm scan
        (1 to 2).foreach { r =>
          val shingled = t(s"shingle_checkpoint_$r") {
            llm.Dedup.withShingles(docsF)
              .select(col("doc_id"), col("shingles")).localCheckpoint(true)
          }
          val res = t(s"dedup_from_shingles_$r") {
            val x = llm.Dedup.minHashDedupFromShingles(shingled,
              docsF.select(col("doc_id")))
            x.count(); x
          }
          t(s"structural_$r") {
            val roots = res.select(col("doc_id").as("keep_id"),
              col("keep_id").as("root_keep"))
            res.join(roots, Seq("keep_id"))
              .select(col("doc_id"),
                (col("keep_id") <= col("doc_id")).as("root_le_ok"),
                (col("root_keep") === col("keep_id")).as("root_closed_ok"),
                (col("is_dup") === (col("doc_id") =!= col("keep_id"))).as("dup_flag_ok"))
              .count()
          }
          t(s"sig_codegen_only_$r") {
            llm.Dedup.minHashSignatures(shingled, 32)
              .select(sum(size(col("sig")))).collect()
          }
          t(s"sig_hof_replay_$r") {
            llm.Dedup.minHashSignatures(shingled, 32)
              .withColumn("sig_hof", expr(
                """flatten(transform(
                  |  array(transform(shingles, t -> abs(cast(hash(t) as bigint)))),
                  |  hs -> transform(sequence(0, 31), j -> array_min(transform(hs, h ->
                  |    ((2 * j + 1) * h + j * 2654435761L) % 4294967311L)))))""".stripMargin
                  .replace("\n", " ")))
              .select(count(when(col("sig") === col("sig_hof"), 1))).collect()
          }
          t(s"whole_query_$r") {
            SparkEntry.queries("llm_dedup_minhash")(spark, dir).count()
          }
        }
      case "cctune" =>
        // conf sensitivity of the iterative loops: shuffle partitions ×
        // AQE on/off. Conf is read at action time, so setting it around
        // the query call scopes it over the loop's internal actions.
        val qs = Seq("op_graph_components", "llm_bpe_learn", "llm_dedup_minhash")
        qs.foreach(q => SparkEntry.queries(q)(spark, dir).count()) // warm
        for ((parts, aqe) <- Seq(("32", "true"), ("4", "true"), ("4", "false"),
            ("1", "false"), ("8", "false"), ("32", "false"))) {
          spark.conf.set("spark.sql.shuffle.partitions", parts)
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          qs.foreach { q =>
            (1 to 2).foreach(r =>
              t(s"${q}_p${parts}_aqe${aqe}_$r") {
                SparkEntry.queries(q)(spark, dir).count()
              })
          }
        }
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      case "cache" =>
        // A/B spark.sql.optimizer.canChangeCachedPlanOutputPartitioning:
        // default false pins every persisted loop frame at the session's
        // 32 partitions (AQE may not coalesce cached plans), so loop map
        // stages schedule 32 micro-tasks per round.
        val key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
        val qs = Seq("op_graph_components", "op_graph_pagerank", "llm_bpe_learn",
          "llm_dedup_minhash", "llm_dedup_cluster_stats", "llm_dedup_minhash_ml",
          "op_cooccurrence")
        qs.foreach(q => SparkEntry.queries(q)(spark, dir).count()) // warm
        for (v <- Seq("false", "true", "false", "true")) {
          spark.conf.set(key, v)
          qs.foreach { q =>
            (1 to 2).foreach(r =>
              t(s"${q}_ccp${v}_$r") { SparkEntry.queries(q)(spark, dir).count() })
          }
        }
        spark.conf.unset(key)
      case "q21ab" =>
        // candidate single-scan rewrite of q21 (verdict r19 #7): the
        // EXISTS ("some other supplier in the order") and NOT EXISTS
        // ("no other supplier late in the order") correlations collapse
        // into one window pass per order — min/max suppkey overall and
        // among late rows — so lineitem is scanned ONCE instead of three
        // times. Row-for-row equality asserted before adopting.
        val newSql =
          """SELECT s_name, COUNT(*) AS numwait
            |FROM (
            |  SELECT l_suppkey, l_shipdate > o_orderdate AS is_late,
            |         MIN(l_suppkey) OVER (PARTITION BY l_orderkey) AS mn_supp,
            |         MAX(l_suppkey) OVER (PARTITION BY l_orderkey) AS mx_supp,
            |         MIN(CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END)
            |           OVER (PARTITION BY l_orderkey) AS mn_late,
            |         MAX(CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END)
            |           OVER (PARTITION BY l_orderkey) AS mx_late
            |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            |  WHERE o_orderstatus = 'F'
            |) x
            |JOIN supplier ON s_suppkey = l_suppkey
            |JOIN nation ON s_nationkey = n_nationkey
            |WHERE is_late AND mn_supp <> mx_supp AND mn_late = mx_late
            |  AND n_name = 'NATION_7'
            |GROUP BY s_name
            |ORDER BY numwait DESC, s_name
            |LIMIT 100""".stripMargin
        val oldRows = t("q21_old_collect") {
          SparkEntry.queries("q21_waiting_supplier")(spark, dir)
            .collect().map(_.toString).toSeq
        }
        val newRows = t("q21_new_collect") {
          Tables.sql(spark, dir, newSql).collect().map(_.toString).toSeq
        }
        println("Q21AB equal=" + (oldRows == newRows) +
          " old=" + oldRows.size + " new=" + newRows.size)
        if (oldRows != newRows)
          println("Q21AB first-diff: old=" +
            oldRows.zip(newRows).find(p => p._1 != p._2))
        (1 to 3).foreach { r =>
          t(s"q21_old_$r") { SparkEntry.queries("q21_waiting_supplier")(spark, dir).count() }
          t(s"q21_new_$r") { Tables.sql(spark, dir, newSql).count() }
        }
      case "evidence" =>
        // r19 verdict #6: the checkpoint-split queries' after-plans show
        // ExistingRDD leaves, hiding the codegen expressions that live in
        // the checkpointed subjobs. Dump the PRE-checkpoint frames'
        // formatted plans so sq_dist_double / word_shingles / the
        // single-scan co-occurrence claim are visible end to end.
        val out = args.lift(1).getOrElse("/root/repo/plans/r20")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(java.nio.file.Paths.get(out, s"$name.txt"),
            txt.getBytes("UTF-8"))
          println(s"EVIDENCE $name -> $out/$name.txt")
        }
        val docsF = Tables.load(spark, dir, "documents")
        val embF = Tables.load(spark, dir, "embeddings")
        dump("llm_embedding_pairs_ml_prejob_evidence",
          llm.MlLsh.embeddingPairsMl(embF, maxL2 = 1.15))
        dump("llm_dedup_minhash_prejob_shingles_evidence",
          llm.Dedup.withShingles(docsF).select(col("doc_id"), col("shingles")))
        dump("llm_dedup_minhash_prejob_pairs_evidence", {
          val sh = llm.Dedup.withShingles(docsF)
            .select(col("doc_id"), col("shingles"))
          llm.Dedup.minHashCandidatePairs(
            llm.Dedup.lshBands(llm.Dedup.minHashSignatures(sh)), sh)
        })
        dump("op_cooccurrence_prejob_items_evidence",
          Tables.load(spark, dir, "lineitem")
            .select(col("l_orderkey").as("__g"), col("l_suppkey").as("__item"))
            .distinct())
      case "rep3" => rep3(args(1))
      case "finalplan" =>
        val q = args(1)
        val df = SparkEntry.queries(q)(spark, dir)
        df.count()
        println("=== FINAL ADAPTIVE PLAN " + q + " ===")
        println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
