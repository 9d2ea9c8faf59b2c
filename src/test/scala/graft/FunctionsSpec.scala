package graft

import graft.functions.RollingHash64
import graft.functions.RollingHash64.rolling_hash64
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Custom expression semantics: RollingHash64 interpreted vs codegen vs an
  * independent reference implementation; plus property checks of the
  * engine-critical exactness invariants (cents sums are partitioning-
  * independent). Properties use raw ScalaCheck generators with fixed seeds
  * (no scalatestplus bridge in the offline dependency set).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent FNV-1a 64 reference. */
  private def fnv1a(s: String): Long = {
    var h = -3750763034362895579L
    s.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * 1099511628211L)
    h
  }

  test("rolling_hash64 matches the FNV-1a reference on sample strings") {
    initLog()
    val samples = Seq("", "a", "abc", "hello world", "ünïcödé ⚡", "x" * 1000)
    val got = samples.toDF("s").select(rolling_hash64(col("s"))).as[Long].collect()
    assert(got.toSeq === samples.map(fnv1a))
  }

  test("rolling_hash64 property: engine result equals reference for random strings") {
    val gen = Gen.listOfN(20, Gen.asciiPrintableStr)
    (1L to 10L).foreach { seed =>
      val strs = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val got = strs.toDF("s").select(rolling_hash64(col("s"))).as[Long].collect()
      assert(got.toSeq === strs.map(fnv1a))
    }
  }

  test("rolling_hash64 is callable from SQL after registration") {
    RollingHash64.registerSql(spark)
    val got = spark.sql("SELECT rolling_hash64('abc') AS h").head().getLong(0)
    assert(got === fnv1a("abc"))
  }

  test("rolling_hash64 is null-safe") {
    val got = Seq(Some("a"), None).toDF("s").select(rolling_hash64(col("s"))).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("scaled_dot_micros equals the HOF formulation on random vectors + edge cases") {
    import graft.functions.ScaledDotMicros.scaled_dot_micros
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-2.0, 2.0))
    val rows = (1L to 50L).map { seed =>
      val a = vecGen.apply(Gen.Parameters.default, Seed(seed)).get
      val b = vecGen.apply(Gen.Parameters.default, Seed(seed + 1000)).get
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"), col("b").cast("array<double>").as("b"))
    val native = df.select(scaled_dot_micros(col("a"), col("b"))).as[Long].collect()
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> cast(floor(x * y * 1000000) as bigint)), " +
        "0L, (acc, v) -> acc + v)")).as[Long].collect()
    assert(native.toSeq === hof.toSeq)
    // reference loop agrees too
    val expected = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => math.floor(x * y * 1e6).toLong }.sum
    }
    assert(native.toSeq === expected)
    // length mismatch and null element -> NULL (zip_with-pad semantics)
    val edge = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),
      (Seq(1.0), Seq(1.0))).toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"), col("b").cast("array<double>").as("b"))
      .select(scaled_dot_micros(col("a"), col("b")).as("d"))
      .collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getLong(0) === 1000000L)
    // SQL registration
    graft.functions.ScaledDotMicros.registerSql(spark)
    val viaSql = spark.sql(
      "SELECT scaled_dot_micros(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Long].head()
    assert(viaSql === 11000000L)
  }

  test("GraftFunctions.registerAll exposes every native expression to SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT rolling_hash64('graft') AS rh,
        |  scaled_dot_micros(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  simhash64(array('a', 'b', 'a')) AS sh,
        |  size(minhash_sig(array('x y z', 'y z w'), 8)) AS nsig,
        |  srp_bucket(array(1.0D, -1.0D), 4) AS bucket""".stripMargin).head()
    assert(r.getLong(0) === fnv1a("graft"))
    assert(r.getLong(1) === 11000000L)
    // simhash of tokens equals the Column-API value
    val viaCol = Seq(Seq("a", "b", "a")).toDF("t")
      .select(graft.functions.SimHash64.simhash64(col("t"))).as[Long].head()
    assert(r.getLong(2) === viaCol)
    assert(r.getInt(3) === 8)
    assert(r.getLong(4) >= 0L && r.getLong(4) < 16L) // 4 planes → 4-bit bucket
  }

  test("jaro_winkler_ppm matches textbook pairs, edge cases, symmetry") {
    import graft.functions.JaroWinklerPpm
    // textbook values (Winkler 1990 examples, ±1 ppm for double rounding)
    val cases = Seq(
      ("MARTHA", "MARHTA", 961111L),
      ("DIXON", "DICKSONX", 813333L),
      ("DWAYNE", "DUANE", 840000L),
      ("abc", "abc", 1000000L),
      ("", "", 1000000L),
      ("abc", "", 0L),
      ("abc", "xyz", 0L))
    cases.foreach { case (a, b, want) =>
      val got = JaroWinklerPpm.ppm(a, b)
      assert(math.abs(got - want) <= 1, s"jw($a,$b)=$got want≈$want")
      assert(got === JaroWinklerPpm.ppm(b, a), s"symmetry broken on ($a,$b)")
    }
    // engine (codegen) path equals the scalar reference on a DataFrame
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("a", "b"))
      .toDF("a", "b")
      .select(JaroWinklerPpm.jaro_winkler_ppm(col("a"), col("b")).as("ppm"))
      .as[Long].collect()
    assert(df.toSeq === Seq(
      JaroWinklerPpm.ppm("MARTHA", "MARHTA"),
      JaroWinklerPpm.ppm("DIXON", "DICKSONX"),
      JaroWinklerPpm.ppm("a", "b")))
    // SQL registration + null safety
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT jaro_winkler_ppm('MARTHA', 'MARHTA') AS p, jaro_winkler_ppm('x', NULL) AS n").head()
    assert(r.getLong(0) === JaroWinklerPpm.ppm("MARTHA", "MARHTA"))
    assert(r.isNullAt(1))
  }

  test("op_join_jarowinkler picks the brute-force best supplier per customer") {
    import graft.functions.JaroWinklerPpm
    val d = "/root/testdata/sf0.001"
    val got = graft.ops.ExtraQueries.joinJaroWinkler.fn(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cs = graft.Tables.load(spark, d, "customer")
      .filter(col("c_custkey") <= 30).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val sups = graft.Tables.load(spark, d, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    cs.foreach { case (ck, cn) =>
      val best = sups.map { case (sk, sn) => (JaroWinklerPpm.ppm(cn, sn), sk) }
        .sortBy { case (p, sk) => (-p, sk) }.head
      assert(got(ck) === ((best._2, best._1)), s"customer $ck")
    }
  }

  test("winnow_fps equals the HOF transform/aggregate/array_min formulation") {
    import graft.functions.WinnowFingerprints
    val (k, w) = (8, 4)
    val hofGrams =
      s"""transform(sequence(1, length(text) - ${k - 1}),
         |  i -> aggregate(sequence(0, ${k - 1}), 0L,
         |    (acc, j) -> acc * 31L + ascii(substring(text, CAST(i + j AS INT), 1))))""".stripMargin
    val hofWinnow =
      s"""array_distinct(transform(sequence(1, size(__hs) - ${w - 1}),
         |  j -> array_min(slice(__hs, j, $w))))""".stripMargin
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(length(col("text")) >= k + w - 1).limit(200)
    val hof = docs.select(col("doc_id"), expr(hofGrams).as("__hs"))
      .select(col("doc_id"), expr(hofWinnow).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val fast = docs.select(col("doc_id"),
        WinnowFingerprints.winnow_fps(col("text"), k, w).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fast === hof)
    // short strings: no full window → empty, matching the length guard
    val short = Seq((1L, "tiny")).toDF("doc_id", "text")
      .select(WinnowFingerprints.winnow_fps(col("text"), k, w).as("fps"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
  }

  test("word_shingles equals the builtin HOF formulation (order + duplicates + edges)") {
    import graft.functions.WordShingles
    val hof =
      """array_distinct(flatten(transform(array(split(text, ' ')), w ->
        |  CASE WHEN size(w) >= 3
        |       THEN transform(sequence(1, size(w) - 2),
        |            i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
        |       ELSE array(text) END)))""".stripMargin
    // full driver corpus at sf0.01 — the exact frame every shingle-based
    // dedup gate consumes
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val ref = docs.select(col("doc_id"), expr(hof).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = docs.select(col("doc_id"),
        WordShingles.word_shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === ref) // ORDER matters: array_distinct keeps first occurrences
    // adversarial token shapes: empties from leading/trailing/consecutive
    // spaces, <3 tokens, duplicates, multi-byte code points, empty string
    val edge = Seq("", "a", "a b", "a b c", "a b c d", "a  b  c",
      " a b c", "a b c ", "a b a b a b", "ü ⚡ é ü ⚡ é", "  ", "x   y")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val edf = edge.toDF("doc_id", "text")
    val eref = edf.select(col("doc_id"), expr(hof).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val efast = edf.select(col("doc_id"),
        WordShingles.word_shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(efast === eref)
    // null propagates
    val nul = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(WordShingles.word_shingles(col("text")).as("sh")).head()
    assert(nul.isNullAt(0))
  }

  test("word_grams equals the builtin HOF formulation (duplicates + short-doc tail)") {
    import graft.functions.WordGrams
    val hof =
      """flatten(transform(array(split(text, ' ')), w ->
        |  transform(sequence(1, greatest(size(w) - 1, 1)),
        |            i -> concat_ws(' ', slice(w, i, 2)))))""".stripMargin
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val ref = docs.select(col("doc_id"), expr(hof).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = docs.select(col("doc_id"),
        WordGrams.word_grams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === ref) // order AND duplicates must match (histogram weights)
    val edge = Seq("", "a", "a b", "a b c", " a", "a ", "a  b", "ü ⚡ é", "  ")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val edf = edge.toDF("doc_id", "text")
    val eref = edf.select(col("doc_id"), expr(hof).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val efast = edf.select(col("doc_id"),
        WordGrams.word_grams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(efast === eref)
    // strict variant ≡ the zip_with-over-shifted-slices rule (LM/census
    // operators): sub-n-token docs emit NOTHING, and tok_a recovered by
    // substring_index equals the zip_with lambda's first operand
    val zw =
      """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
        |  (a, b) -> struct(a AS tok_a, concat(a, ' ', b) AS gram))""".stripMargin
    val all = docs.select(col("doc_id"), col("text")).union(
      edf.select(col("doc_id") + lit(100000L), col("text")))
    val zref = all.withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(zw)).as("g"))
      .select(col("doc_id"), col("g.tok_a"), col("g.gram"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val zfast = all
      .select(col("doc_id"),
        explode(WordGrams.word_grams_strict(col("text"), 2)).as("gram"))
      .select(col("doc_id"), substring_index(col("gram"), " ", 1).as("tok_a"),
        col("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(zfast === zref)
  }

  test("dot_long equals the HOF zip_with/aggregate fold (values + null/length edges)") {
    import graft.functions.DotLong.dot_long
    val rnd = new java.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextLong() % 1000L), Seq.fill(64)(rnd.nextLong() % 1000L))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = df.select(col("id"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = df.select(col("id"), dot_long(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === hof)
    // length mismatch and null array → NULL, matching zip_with's null pad
    val edge = Seq((1L, Seq(1L, 2L), Seq(1L, 2L, 3L)))
      .toDF("id", "a", "b")
      .select(dot_long(col("a"), col("b")).as("d"),
        dot_long(lit(null).cast("array<bigint>"), col("b")).as("dn"))
      .head()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("cents sums are independent of partitioning (exactness invariant)") {
    val df = (1 to 10000).map(i => i * 0.07).toDF("x")
    val one = df.repartition(1).agg(sum(ops.Relational.cents(col("x")))).as[Long].head()
    val many = df.repartition(13).agg(sum(ops.Relational.cents(col("x")))).as[Long].head()
    assert(one === many)
  }

  test("TopKFreq heavy-hitters sketch surfaces true heavy hitters on skewed data") {
    import graft.functions.TopKFreq.top_k_freq
    // zipf-ish: "hot" appears 5000 times, others ≤ 100 — hot MUST survive
    // any Misra-Gries merge order (freq > n/capacity)
    val tokens = Seq.fill(5000)("hot") ++
      (1 to 100).flatMap(i => Seq.fill(100 - i % 7)(s"tok$i"))
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .shuffle(tokens).toDF("t").repartition(7)
    val top = df.agg(top_k_freq(col("t"), 3)).head().getSeq[String](0)
    assert(top.head === "hot", s"top=$top")
  }

  test("exactMoments matches native var_samp within float tolerance") {
    val df = (1 to 500).map(i => ("k", (i % 37) * 1.0)).toDF("k", "v")
    val exact = ops.Relational.exactMoments(df, col("v"), Seq("k"))
      .select("var_samp_exact").as[Double].head()
    val native = df.agg(var_samp(col("v"))).as[Double].head()
    assert(math.abs(exact - native) < 1e-6)
  }
}
