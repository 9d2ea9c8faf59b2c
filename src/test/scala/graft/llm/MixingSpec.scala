package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-composition semantics: exact mixing quotas, packing offsets,
  * deterministic sampling.
  */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is deterministic and tracks the requested rate") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val a = Mixing.hashSample(docs, keepPpm = 200000L).select("doc_id")
    val b = Mixing.hashSample(docs, keepPpm = 200000L).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val frac = a.count().toDouble / docs.count().toDouble
    assert(math.abs(frac - 0.2) < 0.05, s"realized fraction $frac")
    // monotone: a higher threshold keeps a superset
    val wider = Mixing.hashSample(docs, keepPpm = 400000L).select("doc_id")
    assert(a.exceptAll(wider).isEmpty)
  }

  test("splitLeakage counts cross-split duplicate texts and pairs exactly") {
    // 70/15/15 split (recomputed locally) so every split holds enough
    // mass that the duplicate texts provably straddle all three pairs;
    // texts built so "dup" has copies in several splits and "solo" doesn't
    val ids = (1L to 400L)
    def slot(id: Long) = (BigInt(id) * 2654435761L % 4294967311L % 1000000L).toLong
    def split(id: Long) =
      if (slot(id) < 700000L) "train"
      else if (slot(id) < 850000L) "validation" else "test"
    // every 4th doc shares text "dup<id%8>" — guaranteed cross-split copies
    def text(id: Long) = if (id % 4 == 0) s"dup${id % 8}" else s"solo$id"
    val df = ids.map(id => (id, text(id))).toDF("doc_id", "text")
    val got = Mixing.splitLeakage(df, trainPpm = 700000L, valPpm = 150000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val byText = ids.groupBy(text).map { case (t, g) =>
      t -> g.groupBy(split).map { case (s, xs) => s -> xs.size.toLong }
    }
    def want(a: String, b: String) = (
      byText.values.count(m => m.getOrElse(a, 0L) > 0 && m.getOrElse(b, 0L) > 0).toLong,
      byText.values.map(m => m.getOrElse(a, 0L) * m.getOrElse(b, 0L)).sum)
    for ((a, b) <- Seq(("train", "validation"), ("train", "test"), ("validation", "test"))) {
      assert(got((a, b)) === want(a, b), s"pair $a/$b")
      assert(got((a, b))._1 > 0, s"test corpus must actually leak on $a/$b")
    }
  }

  test("epochPlan: exact integer targets, ppm epochs and ceil'd whole passes") {
    // a: 10 tokens, b: 5 tokens; weights a=3, b=1, budget 100
    // → targets a=75, b=25; epochs a=7.5 (7500000 ppm, 8 whole),
    //   b=5.0 (5000000 ppm, 5 whole)
    val docs = Seq(
      (1L, "a", (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "b", (1 to 5).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val weights = Seq(("a", 3L), ("b", 1L), ("c", 0L)).toDF("source", "w")
    val got = Mixing.epochPlan(docs, weights, budgetTokens = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "a" -> ((10L, 75L, 7500000L, 8L)),
      "b" -> ((5L, 25L, 5000000L, 5L))))
  }

  test("splitByContent co-locates exact duplicates; splitLeakage on it is zero") {
    // 300 distinct texts, each duplicated under a SECOND unrelated id —
    // the id-keyed split would scatter many twins across splits; the
    // content-keyed split must place every twin pair together
    val docs = ((1L to 300L).map(i => (i, s"content number $i")) ++
      (1L to 300L).map(i => (i + 100000L, s"content number $i")))
      .toDF("doc_id", "text")
    val sp = Mixing.splitByContent(docs, trainPpm = 700000L, valPpm = 150000L)
    val splitsPerText = sp.groupBy("text")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(splitsPerText === 0L, "twins must share a split")
    // the leakage report on the content-keyed assignment is all-zero:
    // recompute splitLeakage's per-hash math against THIS assignment
    val leak = sp.select(md5(col("text")).as("h"), col("split"))
      .groupBy("h").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(leak === 0L)
    // all three bands are populated at this 70/15/15 setting
    val dist = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.keySet === Set("train", "validation", "test"), dist.toString)
    assert(dist("train") > dist("validation") && dist("train") > dist("test"))
  }

  test("packingEfficiency: exact ceil-division sequence and padding math") {
    // source s: 5 + 3 = 8 tokens; source t: 2 tokens
    val docs = Seq(
      (1L, "s", "a b c d e"), (2L, "s", "f g h"), (3L, "t", "x y")
    ).toDF("doc_id", "source", "text")
    val got = Mixing.packingEfficiency(docs, Seq(3L, 8L))
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("s", 3L) -> ((8L, 3L, 1L)),  // ceil(8/3)=3 seqs, 9-8=1 pad
      ("s", 8L) -> ((8L, 1L, 0L)),  // exact fit
      ("t", 3L) -> ((2L, 1L, 1L)),
      ("t", 8L) -> ((2L, 1L, 6L))))
  }

  test("splitLeakageNearDup matches a local brute force on a crafted corpus") {
    // five text families; members differ by one trailing word, so within
    // a family every pair is a near-dup (high trigram Jaccard, never
    // exact) and across families Jaccard is 0 — the report must equal
    // the locally computed pairwise answer at the same threshold
    val ids = (1L to 60L)
    def text(id: Long) = {
      val f = id % 5
      s"fam$f a$f b$f c$f d$f e$f f$f g$f h$f tail$id"
    }
    def slot(id: Long) = (BigInt(id) * 2654435761L % 4294967311L % 1000000L).toLong
    def split(id: Long) =
      if (slot(id) < 700000L) "train"
      else if (slot(id) < 850000L) "validation" else "test"
    def shingles(id: Long) =
      text(id).split(" ").sliding(3).map(_.mkString(" ")).toSet
    def jac(a: Long, b: Long) = {
      val (sa, sb) = (shingles(a), shingles(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val rank = Map("train" -> 0, "validation" -> 1, "test" -> 2)
    val brute = (for {
      a <- ids; b <- ids if a < b
      j = jac(a, b) if j >= 0.5 && split(a) != split(b)
    } yield {
      val (x, y) = if (rank(split(a)) < rank(split(b))) (split(a), split(b))
                   else (split(b), split(a))
      ((x, y), j)
    }).groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).max))
    }
    assert(brute.nonEmpty, "crafted corpus must leak")
    val got = Mixing.splitLeakageNearDup(
        ids.map(id => (id, text(id))).toDF("doc_id", "text"),
        trainPpm = 700000L, valPpm = 150000L, thresholdPpm = 500000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === brute.keySet)
    brute.foreach { case (k, (n, mx)) =>
      assert(got(k)._1 === n, s"pair count $k")
      assert(math.abs(got(k)._2 - mx) < 1e-12, s"max jaccard $k")
    }
  }

  test("permute matches the mathematical (id*C) mod M at overflow-scale ids") {
    // the naive id * 2654435761L product overflows Long at id >= ~3.5e9 —
    // ANSI mode (Spark 4 default) would ABORT there; the decomposed
    // spelling must agree with BigInteger arithmetic at every magnitude
    val ids = Seq(0L, 1L, 12345L, 3_500_000_000L, 4_294_967_311L,
      4_000_000_000_000L, Long.MaxValue - 1, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), Mixing.permute(col("doc_id")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val M = java.math.BigInteger.valueOf(4294967311L)
    val C = java.math.BigInteger.valueOf(2654435761L)
    ids.foreach { id =>
      val expect = java.math.BigInteger.valueOf(id).multiply(C).mod(M).longValueExact()
      assert(got(id) === expect, s"permute($id)")
    }
  }

  test("mixDomains hits exact integer quotas and drops zero-weight sources") {
    // a: 100 rows, b: 50, c: 30, z: 10 — weights 3/1/1/0
    val docs = (
      (1L to 100L).map(i => (i, "a")) ++ (101L to 150L).map(i => (i, "b")) ++
      (151L to 180L).map(i => (i, "c")) ++ (181L to 190L).map(i => (i, "z"))
    ).toDF("doc_id", "source")
    val weights = Seq(("a", 3L), ("b", 1L), ("c", 1L), ("z", 0L)).toDF("source", "w")
    val out = Mixing.mixDomains(docs, weights)
    // W=5; T=min(100*5/3, 50*5/1, 30*5/1)=min(166,250,150)=150
    // quotas: a=3*150/5=90, b=1*150/5=30, c=30, z dropped
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 90L, "b" -> 30L, "c" -> 30L))
    // quota rows are the lowest-permutation ones: re-running on the kept set
    // with the same weights keeps everything (fixpoint)
    val again = Mixing.mixDomains(out, weights.filter(col("w") > 0))
    assert(again.count() === out.count())
  }

  test("packSequences lays documents head-to-tail with exact offsets") {
    val docs = Seq(
      (1L, "s", "a b c"),           // 3 tokens, start 0, seq 0
      (2L, "s", "d e f g h i j"),   // 7 tokens, start 3, spans seq 0..1
      (3L, "s", "k l"),             // 2 tokens, start 10, seq 1
      (4L, "t", "x y z")            // separate shard restarts at 0
    ).toDF("doc_id", "source", "text")
    val out = Mixing.packSequences(docs, contextLen = 8)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // (start_offset, seq_id, seq_pos, end_seq_id)
    assert(out(1L) === ((0L, 0L, 0L, 0L)))
    assert(out(2L) === ((3L, 0L, 3L, 1L)))  // crosses the 8-token boundary
    assert(out(3L) === ((10L, 1L, 2L, 1L)))
    assert(out(4L) === ((0L, 0L, 0L, 0L)))
  }

  test("mixDomainsByTokens keeps the greedy prefix within each token quota") {
    // a: 4 docs of 10 tokens, b: 4 docs of 10 tokens; weights a=3, b=1;
    // B=40 → W=4, quota a=30, b=10 → a keeps 3 docs, b keeps 1
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = ((1L to 4L).map(i => (i, "a", ten)) ++
      (5L to 8L).map(i => (i, "b", ten))).toDF("doc_id", "source", "text")
    val weights = Seq(("a", 3L), ("b", 1L)).toDF("source", "w")
    val out = Mixing.mixDomainsByTokens(docs, weights, budgetTokens = 40L)
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 1L))
    // a doc longer than the whole quota truncates the prefix at that doc
    val long = Seq((1L, "c", (1 to 50).map(i => s"x$i").mkString(" ")),
      (2L, "c", "a b")).toDF("doc_id", "source", "text")
    val kept = Mixing.mixDomainsByTokens(long, Seq(("c", 1L)).toDF("source", "w"),
      budgetTokens = 20L).select("doc_id").collect().map(_.getLong(0)).toSet
    // permutation order decides which doc comes first; whatever the order,
    // the 50-token doc can never fit a 20-token quota
    assert(!kept.contains(1L))
  }

  test("mixDomainsByTokens two-phase plan ≡ naive single-window greedy prefix") {
    // the bucketed plan must keep the BIT-IDENTICAL set the straightforward
    // one-window-per-source formulation keeps, at any bucket granularity
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val weights = docs.select(col("source")).distinct()
      .select(col("source"), (length(col("source")) % 3 + 1).cast("long").as("w"))
    def naive(budget: Long): Set[Long] = {
      val wdf = weights.toDF("__src", "__w").filter(col("__w") > 0)
      val sumw = wdf.agg(sum(col("__w")).as("__sumw"))
      val quota = wdf.crossJoin(broadcast(sumw))
        .select(col("__src"), expr(s"__w * ${budget}L div __sumw").as("__m"))
      val w = Window.partitionBy(col("source"))
        .orderBy(Mixing.permute(col("doc_id")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("__nt", size(split(col("text"), " ")).cast("long"))
        .withColumn("__cum", sum(col("__nt")).over(w))
        .join(broadcast(quota), col("source") === col("__src"))
        .filter(col("__cum") <= col("__m"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    for (budget <- Seq(3000L, 20000L); buckets <- Seq(1, 7, 4096)) {
      val got = Mixing.mixDomainsByTokens(docs, weights, budget,
        permBuckets = buckets).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === naive(budget), s"budget=$budget buckets=$buckets")
    }
  }

  test("mixDomainsByTokens never exceeds quota on real data") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val weights = docs.select(col("source")).distinct()
      .select(col("source"), lit(1L).as("w"))
    val n = weights.count()
    val out = Mixing.mixDomainsByTokens(docs, weights, budgetTokens = 10000L)
    val perSource = out
      .withColumn("nt", size(split(col("text"), " ")).cast("long"))
      .groupBy("source").agg(sum("nt").as("tok"))
      .filter(col("tok") > lit(10000L / n))
    assert(perSource.isEmpty, "a source exceeded its token quota")
  }

  test("shuffleShard is a deterministic permutation with dense per-shard positions") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Mixing.shuffleShard(docs, numShards = 8)
    val b = Mixing.shuffleShard(docs, numShards = 8)
    assert(a.select("doc_id", "shard", "pos")
      .exceptAll(b.select("doc_id", "shard", "pos")).isEmpty)
    // every doc appears exactly once
    assert(a.count() === docs.count())
    assert(a.select("doc_id").distinct().count() === docs.count())
    // positions are 1..count(shard) dense
    val holes = a.groupBy("shard").agg(
      count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(holes.isEmpty)
  }

  test("weightedSample: inclusion tracks the per-row weight; weight 1e6+ keeps all") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // weight ∝ doc length: heavier docs must be over-represented
    val kept = Mixing.weightedSample(docs, least(col("n_chars") * 2000L, lit(800000L)))
    val rateAll = kept.count().toDouble / docs.count()
    assert(rateAll > 0.2 && rateAll < 0.9, s"overall rate $rateAll out of range")
    val heavyRate = kept.filter(col("n_chars") >= 400).count().toDouble /
      math.max(1L, docs.filter(col("n_chars") >= 400).count())
    val lightRate = kept.filter(col("n_chars") < 100).count().toDouble /
      math.max(1L, docs.filter(col("n_chars") < 100).count())
    assert(heavyRate > lightRate,
      s"weighting inverted: heavy $heavyRate <= light $lightRate")
    // clamp: weight >= 1e6 keeps every row; weight 0 keeps none
    assert(Mixing.weightedSample(docs, lit(2000000L)).count() === docs.count())
    assert(Mixing.weightedSample(docs, lit(0L)).count() === 0L)
    // deterministic
    assert(Mixing.weightedSample(docs, col("n_chars") * 1000L).count() ===
      Mixing.weightedSample(docs.repartition(5), col("n_chars") * 1000L).count())
  }

  test("temperatureMix flattens head domains and caps at availability") {
    import spark.implicits._
    // 900 head docs vs 100 tail docs: proportional split of 100 would give
    // the tail 10; √n-temperature gives it 100·10/(30+10) = 25
    val docs = ((1 to 900).map(i => (i.toLong, "head")) ++
      (901 to 1000).map(i => (i.toLong, "tail"))).toDF("doc_id", "source")
    val got = Mixing.temperatureMix(docs, budgetDocs = 100)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("tail") === 25L, s"tail allocation ${got("tail")} != 25")
    assert(got("head") === 75L)
    // allocation never exceeds availability
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val capped = Mixing.temperatureMix(tiny, budgetDocs = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(capped("a") <= 2L && capped("b") <= 1L)
  }

  test("splitTrainValTest: partition is total, deterministic, and ingest-stable") {
    val docs = (1L to 2000L).map(i => Tuple1(i)).toDF("doc_id")
    val out = Mixing.splitTrainValTest(docs, trainPpm = 900000L, valPpm = 50000L)
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row lands in exactly one split
    assert(byS.values.sum === 2000L)
    assert(byS.keySet === Set("train", "validation", "test"))
    // train dominates at a 90% share (loose band — permutation is uniform)
    assert(byS("train") > 1600L && byS("train") < 2000L)
    // ingest stability: the assignment of doc 1..2000 is unchanged when
    // the table doubles — membership depends only on the id
    val grown = (1L to 4000L).map(i => Tuple1(i)).toDF("doc_id")
    val before = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Mixing.splitTrainValTest(grown, 900000L, 50000L)
      .filter(col("doc_id") <= 2000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === after)
  }

  test("packSequences offsets are dense within each shard on real data") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Mixing.packSequences(docs, contextLen = 64)
    // Σ n_tokens per shard == last start_offset + its n_tokens (no gaps)
    val check = out.groupBy("source").agg(
      sum("n_tokens").as("total"),
      max(col("start_offset") + col("n_tokens")).as("laid"))
      .filter(col("total") =!= col("laid"))
    assert(check.isEmpty)
  }

  test("dsirWeights: exact fixed-point ratio on a hand-computable corpus") {
    // raw = 6 tokens total, target = 3 ('a a b' doc); per-token ppm:
    //   a: raw_c=3, tgt_c=2 → 1e6·3·6 / (4·3) = 1_500_000
    //   b: raw_c=2, tgt_c=1 → 1e6·2·6 / (3·3) = 1_333_333 (floor)
    //   c: raw_c=1, tgt_c=0 → 1e6·1·6 / (2·3) = 1_000_000
    val docs = Seq(
      (1L, "a a b", "en"), (2L, "a b c", "fr")).toDF("doc_id", "text", "lang")
    val got = Mixing.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L * 1500000L + 1333333L),
      (2L, 3L, 1500000L + 1333333L + 1000000L)))
    // target-like doc outranks the raw-only doc, as DSIR intends
    assert(got(0)._3 > got(1)._3)
    // partition-invariant: same scores under a different layout
    val re = Mixing.dsirWeights(docs.repartition(7), col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSeq === got.toSeq)
    // empty target slice fails fast with a NAMED error, not DIV-by-zero
    val err = intercept[Exception] {
      Mixing.dsirWeights(docs, col("lang") === "xx").collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("target slice is empty") ||
        Option(err.getCause).exists(_.getMessage.contains("target slice is empty"))))
  }

  test("curriculumPlan: exact band arithmetic, fixed thresholds, NULL text") {
    // "a b c" → n_tok 3, n_dis 3: len_ppm = 1e6*3 div 512 = 5859,
    //   rep_ppm = 1e6 - 1e6*3 div 3 = 0 → difficulty (5859+0) div 2 = 2929 → band 0
    // "a a a a" → n_tok 4, n_dis 1: len 7812, rep 750000 → 378906 → band 1
    // NULL → [''] : n_tok 1, n_dis 1: len 1953, rep 0 → 976 → band 0
    val docs = Seq((1L, "s", "a b c"), (2L, "s", "a a a a"),
      (3L, "s", null.asInstanceOf[String])).toDF("doc_id", "source", "text")
    val out = Mixing.curriculumPlan(docs, bands = 4).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("s", 0L)) === ((2L, 4L, 976L, 2929L)))
    assert(out(("s", 1L)) === ((1L, 4L, 378906L, 378906L)))
    // a maximal difficulty lands in the LAST band, never past it
    val extreme = Seq((1L, "t", ("z " * 600).trim)).toDF("doc_id", "source", "text")
    val b = Mixing.curriculumPlan(extreme, bands = 4)
      .select(col("band")).head().getLong(0)
    assert(b === 3L) // len 1e6, rep 1e6-1e6*1 div 600 = 998334 → 999167 → band 3
  }

  test("corpusConcentration: shares, ranks, cumulative and HHI are exact") {
    // a: 6 tokens, b: 3, c: 1 → total 10; shares 600000/300000/100000 ppm
    val docs = Seq(
      (1L, "a", "t1 t2 t3"), (2L, "a", "t4 t5 t6"),
      (3L, "b", "u1 u2 u3"),
      (4L, "c", "v1"), (5L, "c", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val rows = Mixing.corpusConcentration(docs).collect()
    val byS = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // (n_docs, n_tokens, share_ppm, rank, cum_share_ppm)
    assert(byS("a") === ((2L, 6L, 600000L, 1L, 600000L)))
    assert(byS("b") === ((1L, 3L, 300000L, 2L, 900000L)))
    assert(byS("c") === ((2L, 1L, 100000L, 3L, 1000000L))) // NULL doc counted, 0 tokens
    // HHI = (6e5² + 3e5² + 1e5²) div 1e6 = 460000, same on every row
    assert(rows.map(_.getLong(6)).toSet === Set(460000L))
    // a zero-token corpus yields a degenerate report (shares/HHI 0),
    // never an ANSI DIVIDE_BY_ZERO abort
    val empty = Seq((1L, "a", null.asInstanceOf[String]), (2L, "b", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val er = Mixing.corpusConcentration(empty).collect()
    assert(er.length === 2)
    assert(er.forall(r => r.getLong(3) === 0L && r.getLong(6) === 0L))
  }
}
