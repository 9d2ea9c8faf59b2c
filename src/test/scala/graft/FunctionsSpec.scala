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
