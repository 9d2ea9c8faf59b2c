package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of and range join semantics on hand-checkable data, plus the
  * bucketed-table co-located join (no shuffle before the join).
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks latest right row at-or-before each left ts, null when none") {
    initLog()
    val left = Seq((1L, 10L, "p1"), (1L, 3L, "p0"), (2L, 50L, "p2"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (2L, 60L, "d"))
      .toDF("k", "rt", "rv")
    val out = Relational.asOfJoin(left, right, "k", "t", "rt")
      .orderBy(col("k"), col("t")).collect()
    // (1, 3): no right <= 3 → null; (1, 10): right at 10 matches (>=); (2, 50): none <= 50
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getAs[String]("rv"))).toSeq ===
      Seq((1L, 3L, null), (1L, 10L, "b"), (2L, 50L, null)))
  }

  test("asOfJoin returns the complete as-of row: NULL payloads honored, no cross-row mixing") {
    val left = Seq((1L, 12L, "p")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, Some(7.0), Some("w5")),
      (1L, 10L, None: Option[Double], Some("w10"))
    ).toDF("k", "rt", "rv", "rw")
    val out = Relational.asOfJoin(left, right, "k", "t", "rt").collect()
    assert(out.length === 1)
    // as-of row is ts=10: rv must be its NULL (not the stale 7.0 from
    // ts=5) and rw must be w10 from the SAME row
    assert(out.head.isNullAt(out.head.fieldIndex("rv")))
    assert(out.head.getAs[String]("rw") === "w10")
  }

  test("internal working-column collisions are rejected, not silently dropped") {
    val l = Seq((1L, 2L)).toDF("k", "__salt")
    val r = Seq((1L, "x")).toDF("k2", "v")
    intercept[IllegalArgumentException](Relational.saltedJoin(l, r, "k", "k2"))
  }

  test("rangeJoin equals the plain non-equi join") {
    val left = (1 to 500).map(i => (i.toLong, (i % 97) * 1.0)).toDF("id", "v")
    val bands = Seq(("a", 0.0, 30.0), ("b", 25.0, 60.0), ("c", 90.0, 96.0)).toDF("band", "lo", "hi")
    val bucketed = Relational.rangeJoin(left, "v", bands, "lo", "hi", bucketWidth = 20.0)
      .select(col("id"), col("band"))
    val plain = left.join(bands, col("v") >= col("lo") && col("v") <= col("hi"))
      .select(col("id"), col("band"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    assert(plain.count() > 0)
  }

  test("bucketed tables join without a shuffle before the join") {
    // managed tables land in ./spark-warehouse (gitignored); dropped below
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    val b = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")
    // disable broadcast so the join would shuffle if not co-located
    spark.sql("SET spark.sql.autoBroadcastJoinThreshold=-1")
    try {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle, plan:\n${plan.take(800)}")
      assert(joined.count() === 1000)
    } finally {
      spark.sql("SET spark.sql.autoBroadcastJoinThreshold=10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
