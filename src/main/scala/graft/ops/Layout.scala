package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — the write-side half of scan performance at
  * 100 TB. Z-order (Morton) interleaving maps two sort dimensions onto one
  * clustering key so parquet row-group min/max stats stay tight on BOTH
  * columns; a reader filtering on either dimension (or a box on both)
  * skips most files, where a lexicographic sort is tight only on the
  * leading column. Same operator family as Delta Lake's OPTIMIZE ZORDER
  * BY; expressed here as pure codegen'd column arithmetic (shifts/masks
  * fuse into whole-stage codegen with the scan — no UDF, no custom
  * expression needed).
  */
object Layout {

  private val SpreadSteps = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `c` so bit i lands at position 2i
    * (magic-number bit spreading, public-domain bit-twiddling idiom).
    */
  def spread32(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 64-bit Morton code of two 32-bit dimensions: x bits at even
    * positions, y bits at odd.
    */
  def zorder2(x: Column, y: Column): Column =
    spread32(x).bitwiseOR(shiftleft(spread32(y), 1))

  /** Flip the 32-bit sign bit so SIGNED dimension values order correctly
    * in the unsigned Morton space: raw low-32 masking would sort every
    * negative value (-1 → 0xFFFFFFFF) ABOVE all positives, shredding the
    * min/max locality near zero that z-ordering exists for. The flip is
    * order-preserving over the whole signed 32-bit range (-2^31 → 0,
    * -1 → 2^31-1, 0 → 2^31) — the same normalization Delta's OPTIMIZE
    * ZORDER applies before interleaving.
    */
  private def signFlip32(c: Column): Column =
    c.cast("long").bitwiseXOR(lit(0x80000000L))

  /** Cluster a frame for writing: range-partition on the Morton code of
    * (xCol, yCol) — each dimension sign-flipped into unsigned space via
    * [[signFlip32]] so negative coordinates cluster correctly — then
    * sort within partitions, so each output file covers a compact box in
    * (x, y) space. `keepKey` retains the `zvalue` column for inspection.
    * At scale this is the one full shuffle you pay at write time to make
    * every later selective scan cheap.
    */
  def clusterByZOrder(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, keepKey: Boolean = false): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(!df.columns.contains("zvalue"),
      "clusterByZOrder uses a working column 'zvalue'; the input already " +
        "has one — rename it first (it would be clobbered" +
        (if (keepKey) ")" else " and then dropped)"))
    // The raw Morton code puts y's sign-flipped bit 31 at LONG BIT 63 —
    // the sign bit of the key that repartitionByRange/sortWithinPartitions
    // compare as a SIGNED long, which would order every y ≥ 0 row before
    // every y < 0 row (the exact cross-zero inversion signFlip32 exists
    // to prevent, reintroduced one level up). XOR with Long.MinValue
    // flips bit 63 so signed comparison equals unsigned Morton order.
    val keyed = df.withColumn("zvalue",
      zorder2(signFlip32(col(xCol)), signFlip32(col(yCol)))
        .bitwiseXOR(lit(Long.MinValue)))
    val parted = keyed
      .repartitionByRange(numPartitions, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
    if (keepKey) parted else parted.drop("zvalue")
  }
}
