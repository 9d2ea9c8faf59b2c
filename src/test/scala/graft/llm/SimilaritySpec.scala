package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search: brute-force correctness on hand-checkable vectors,
  * IVF cell restriction, and LSH recall against brute force.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (1,0,...) and (0,1,...) + axis outlier
  private lazy val vecs = {
    initLog()
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (2L, Array(0.8f, 0.2f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.1f, 0.9f, 0.0f, 0.0f), 1),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
  }

  test("bruteForceTopK ranks the tight cluster first") {
    val out = Similarity.bruteForceTopK(vecs, k = 2, queryMaxId = 1).collect()
    assert(out.map(_.getAs[Long]("b_id")).toSeq === Seq(1L, 2L))
    val cos1 = out.head.getAs[Double]("cosine")
    val expected = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1) // cos((1,0),(0.9,0.1))
    assert(math.abs(cos1 - expected) < 1e-3) // 1e-6 quantization of products
  }

  test("ivfTopK only searches the query's cell") {
    val out = Similarity.ivfTopK(vecs, k = 5, queryMaxId = 1).collect()
    assert(out.map(_.getAs[Long]("b_id")).toSet === Set(1L, 2L)) // same-label only
  }

  test("lshTopK: identical vectors always collide (collision prob 1)") {
    // LSH's hard guarantee: cos=1 pairs share every sign bit, so an exact
    // duplicate vector is always found regardless of plane count.
    val v = Array(0.3f, -0.5f, 0.8f, 0.1f)
    val dup = Seq(
      (0L, v, 0), (1L, v, 0),
      (2L, Array(-0.9f, 0.2f, -0.1f, 0.4f), 1),
      (3L, Array(0.0f, 0.0f, -1.0f, 0.2f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.lshTopK(dup, k = 1, queryMaxId = 1, planes = 12).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("b_id") === 1L)
    assert(math.abs(out.head.getAs[Double]("cosine") - 1.0) < 1e-3)
  }

  test("lshTopK recall on the driver corpus behaves like SRP theory") {
    // Weakly-similar corpus (top-3 cosine ≈ 0.37 → per-plane collision
    // ≈ 0.62): recall falls with plane count; just assert non-empty
    // results and that fewer planes never reduce the candidate overlap.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteForceTopK(emb, k = 3, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlapAt = (planes: Int) =>
      Similarity.lshTopK(emb, k = 3, queryMaxId = 10, planes = planes)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(brute).size
    val few = overlapAt(2)
    val many = overlapAt(8)
    assert(few > 0, "2-plane LSH should recover some true neighbors")
    assert(few >= many, s"recall should not increase with more planes ($few vs $many)")
  }

  test("SrpBucket native expression is bit-identical to the HOF formulation") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val planes = 12
    val base = Similarity.srpBuckets(emb, planes).select(col("vec_id"), col("bucket"))
    // the pre-round-4 doubly-nested HOF text — the independent reference
    val hof = emb
      .withColumn("vd", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("bucket_hof", expr(
        s"""aggregate(
           |  transform(sequence(0, ${planes - 1}),
           |    p -> if(aggregate(zip_with(vd, sequence(0, size(vd) - 1),
           |             (x, i) -> if(pmod(hash(p * 7919 + i), 2) = 0, x, -x)),
           |           cast(0.0 as double), (acc, v) -> acc + v) > 0,
           |         shiftleft(1L, p), 0L)),
           |  0L, (acc, b) -> acc | b)""".stripMargin))
      .select(col("vec_id").as("h_id"), col("bucket_hof"))
    val joined = base.join(hof, col("vec_id") === col("h_id"))
    assert(joined.filter(col("bucket") =!= col("bucket_hof")).count() === 0)
    assert(joined.count() > 0)
  }

  test("sq8TopK: quantized ranking keeps high recall vs the exact ranking") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForceTopK(emb, k = 5, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Similarity.sq8TopK(emb, k = 5, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.intersect(sq8).size
    info(s"SQ8 overlap $overlap/${exact.size}")
    // int8 quantization of 64-dim unit-bounded vectors barely moves the
    // ranking — require 80% top-5 agreement
    assert(overlap.toDouble / exact.size >= 0.8,
      s"SQ8 recall collapsed: $overlap/${exact.size}")
    // determinism under repartitioning (pure integer math)
    val again = Similarity.sq8TopK(emb.repartition(7), k = 5, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === sq8)
  }

  test("pqTopK: ADC + exact refine keeps high recall vs the exact ranking") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForceTopK(emb, k = 5, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, k = 5, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.intersect(pq).size
    info(s"PQ overlap $overlap/${exact.size}")
    // 8 subspaces x 16 learned codes with an 8x exact-refine shortlist:
    // require 60% top-5 agreement (the ADC pass is coarse on this
    // weakly-similar corpus; refine rescues true neighbors that survive
    // into the shortlist — measured 68% at these settings)
    assert(overlap.toDouble / exact.size >= 0.6,
      s"PQ recall collapsed: $overlap/${exact.size}")
    // training + search are exact integer paths — deterministic under
    // repartitioning
    val again = Similarity.pqTopK(emb.repartition(7), k = 5, queryMaxId = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === pq)
    // every returned cosine must be exact: it equals the brute-force value
    // for the same pair (the refine step uses the same scaled-int dot)
    val bruteCos = Similarity.bruteForceTopK(emb, k = 5, queryMaxId = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.pqTopK(emb, k = 5, queryMaxId = 10).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteCos.get(key).foreach(c => assert(c === r.getDouble(2), s"cosine drift at $key"))
    }
  }

  test("lshTopK recall at sf0.1 vs brute force — bench scale", graft.SlowTest) {
    // Same weakly-similar corpus at 100× the rows: with 2 planes the
    // per-pair bucket-collision probability for the top-k cosines (~0.4)
    // is (1 - θ/π)² ≈ 0.38, so over 20 queries × k=3 the expected overlap
    // is ≈ 23 pairs; ≥ 10 is > 5σ below that — a real recall floor, while
    // still loose enough for seed variance.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val brute = Similarity.bruteForceTopK(emb, k = 3, queryMaxId = 20)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, k = 3, queryMaxId = 20, planes = 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = brute.intersect(lsh).size
    info(f"sf0.1: SRP-LSH overlap $overlap/${brute.size} at 2 planes")
    assert(brute.size >= 50, s"expected ~60 brute-force pairs, got ${brute.size}")
    assert(overlap >= 10, s"SRP recall collapsed at sf0.1: $overlap/${brute.size}")
  }

  test("semanticDedup flags within-cell near-dups, keeps lowest id, respects cells") {
    import spark.implicits._
    val v = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val almost = Array(0.99f, 0.14f, 0.0f, 0.0f) // cos ≈ 0.99 with v
    val far = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val emb = Seq(
      (1L, v, 0), (2L, almost, 0),  // same cell, near-dup → 2 flagged
      (3L, far, 0),                 // same cell, dissimilar → kept
      (4L, v, 1)                    // IDENTICAL to 1 but a different cell → kept
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.semanticDedup(emb, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("zero-norm vectors rank LAST in top-k and never flag neighbors as dups") {
    // id 6 quantizes to norm 0 (all |x| < 1e-3): raw IEEE cosine would be
    // NaN (sorts FIRST under desc) — the guard must rank it last instead
    val withZero = vecs.unionAll(Seq(
      (6L, Array(1e-4f, 1e-4f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val top = Similarity.bruteForceTopK(withZero, k = 2, queryMaxId = 1).collect()
    assert(top.map(_.getAs[Long]("b_id")).toSeq === Seq(1L, 2L)) // not 6
    // semanticDedup: the zero vector shares cell 0 with ids 0-2; without
    // the norm guard every higher-id cellmate would satisfy dot >= t*0
    val dup = Similarity.semanticDedup(withZero, threshold = 0.92,
        cellCol = "label")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(dup(6L) === false)             // degenerate row is not a "dup"
    assert(dup(5L) === false)             // lone cell-2 vector untouched
  }

  test("pqTopK raises a doc-naming error on a dims mismatch") {
    val err = intercept[Exception] {
      Similarity.pqTopK(vecs, k = 1, queryMaxId = 1, m = 2, dims = 8).collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("expected 8-dim vectors"))
  }
}
