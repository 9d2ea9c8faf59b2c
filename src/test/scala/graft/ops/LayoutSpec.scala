package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness against a reference
  * implementation, and the property the operator exists for — clustered
  * partitions cover compact boxes in BOTH dimensions, where a
  * lexicographic sort is compact only in the leading one.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refSpread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  test("zorder2 matches bit-by-bit reference on edge and random values") {
    initLog()
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (0xFFFFFFFFL, 0xFFFFFFFFL), (12345L, 54321L), (0xDEADBEEFL, 0xCAFEBABEL))
    val out = vals.toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) =>
      assert(z === (refSpread(x) | (refSpread(y) << 1)), s"($x, $y)")
    }
  }

  test("clusterByZOrder shrinks per-partition extent on the second dimension") {
    initLog()
    // 64x64 grid, shuffled input: a lexicographic sort on x leaves each
    // partition spanning the FULL y range; z-order boxes both.
    val grid = spark.range(4096).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    def meanYExtent(df: org.apache.spark.sql.DataFrame): Double = {
      val ext = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("y") - min("y")).as("ey"))
        .agg(avg("ey")).head().getDouble(0)
      ext
    }
    val z = Layout.clusterByZOrder(grid, "x", "y", numPartitions = 16)
    val lex = grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
    val (zExt, lexExt) = (meanYExtent(z), meanYExtent(lex))
    assert(zExt < lexExt / 2,
      s"z-order mean y-extent $zExt should be well under lexicographic $lexExt")
    // no rows lost, key column dropped by default
    assert(z.count() === 4096L)
    assert(!z.columns.contains("zvalue"))
  }

  test("clusterByZOrder keeps locality across the sign boundary") {
    initLog()
    // signed grid centered on 0: raw low-32 masking would sort every
    // negative x ABOVE all positives (-1 → 0xFFFFFFFF) and a partition
    // near the boundary would span almost the whole x domain; the
    // sign-flip keeps boxes compact
    val grid = spark.range(4096).select(
      ((col("id") / 64).cast("long") - 32).as("x"), (col("id") % 64 - 32).as("y"))
    val z = Layout.clusterByZOrder(grid, "x", "y", numPartitions = 16, keepKey = true)
    val ext = z.withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("x") - min("x")).as("ex"))
      .agg(avg("ex")).head().getDouble(0)
    assert(ext < 32,
      s"mean per-partition x-extent $ext must stay a compact box on signed data")
    // the clustering key itself orders negatives below positives
    val rows = Seq(-2L, -1L, 0L, 1L).toDF("x").withColumn("y", lit(0L))
    val keys = Layout.clusterByZOrder(rows, "x", "y", 1, keepKey = true)
      .orderBy("x").select("zvalue").collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted),
      s"zvalue must be monotone over the sign boundary, got ${keys.mkString(",")}")
    // ... on the Y axis too: y's sign-flipped top bit lands at LONG BIT
    // 63, so without the final bit-63 flip the SIGNED key would order
    // every y >= 0 row before every y < 0 row (the regression this pins)
    val yrows = Seq(-2L, -1L, 0L, 1L).toDF("y").withColumn("x", lit(0L))
    val ykeys = Layout.clusterByZOrder(yrows, "x", "y", 1, keepKey = true)
      .orderBy("y").select("zvalue").collect().map(_.getLong(0))
    assert(ykeys.sameElements(ykeys.sorted),
      s"zvalue must be monotone over the Y sign boundary, got ${ykeys.mkString(",")}")
  }

  test("clusterByZOrder refuses an input that already has a zvalue column") {
    val df = Seq((1L, 2L, 99L)).toDF("x", "y", "zvalue")
    val err = intercept[IllegalArgumentException](
      Layout.clusterByZOrder(df, "x", "y", 2))
    assert(err.getMessage.contains("zvalue"))
  }
}
