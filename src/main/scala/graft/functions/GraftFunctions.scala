package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL registration for every custom Catalyst expression in the
  * engine — the user-facing equivalent of a UDF registry, except each entry
  * is a codegen'd native expression, not a UDF. After
  * `GraftFunctions.registerAll(spark)`, SQL text (including text routed
  * through [[graft.Engine.execute]]) can call `rolling_hash64`,
  * `scaled_dot_micros`, `simhash64`, `minhash_sig`, `srp_bucket`,
  * `nfc_normalize`, `jaro_winkler_ppm`.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    RollingHash64.registerSql(spark)
    ScaledDotMicros.registerSql(spark)
    SimHash64.registerSql(spark)
    MinHashSig.registerSql(spark)
    SrpBucket.registerSql(spark)
    NfcNormalize.registerSql(spark)
    JaroWinklerPpm.registerSql(spark)
  }
}
