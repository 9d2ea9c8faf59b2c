package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ScaledDotMicros.scaled_dot_micros

/** Similarity search over embedding columns (`array<float>`) — north-star
  * extension (BASELINE.json). Three tiers:
  *
  *  - brute-force top-k: exact, O(|Q|·n·d) — the correctness baseline.
  *    Dot products use exact scaled-integer sums so results are
  *    reproducible bit-for-bit on any cluster size / reduction order,
  *    computed by the codegen'd [[graft.functions.ScaledDotMicros]]
  *    expression (a fused multiply-floor-accumulate loop inside
  *    whole-stage codegen, not an interpreted zip_with/aggregate chain).
  *  - IVF-style partitioned top-k: restrict the search to a coarse
  *    partition (here the precomputed `label` column as the quantizer
  *    cell) — the classic inverted-file scale path: each query probes
  *    1/cells of the data.
  *  - sign-random-projection LSH buckets: deterministic hyperplanes from
  *    murmur3, 16-bit bucket key, search within bucket — sublinear
  *    candidate generation when no quantizer exists.
  */
object Similarity {

  /** Normalize embeddings to double and attach exact self-dot (μ-units:
    * floor(x²·10⁶) summed as BIGINT — order-independent). Keeps all other
    * columns of `e`.
    */
  private def withNorm(e: DataFrame, vecCol: String): DataFrame =
    e.withColumn("vd", expr(s"transform(`$vecCol`, x -> cast(x as double))"))
      .withColumn("norm_m", scaled_dot_micros(col("vd"), col("vd")))

  /** Quantized cosine over the standard (dot_m, a_norm, b_norm) columns,
    * with a zero-norm guard: a vector whose components are all |x| < 1e-3
    * quantizes to norm 0, and the raw IEEE division would emit NaN/∞ —
    * which desc-sort ABOVE every real cosine and would crown a garbage
    * candidate rank 1. Degenerate rows rank LAST instead (cosine −2.0,
    * below the [−1, 1] range). The guard only changes undefined-input
    * behavior; on any vector with a nonzero quantized norm the expression
    * tree is the identical one the DuckDB oracles replay.
    */
  private def guardedCosine: Column =
    when(col("a_norm") > 0L && col("b_norm") > 0L,
      col("dot_m").cast("double") /
        (sqrt(col("a_norm").cast("double")) * sqrt(col("b_norm").cast("double"))))
      .otherwise(lit(-2.0))

  /** Exact brute-force cosine top-k for the query rows (`id < queryMaxId`).
    * Cosine = Σ⌊xᵢyᵢ·10⁶⌋ / (√Σ⌊xᵢ²·10⁶⌋·√Σ⌊yᵢ²·10⁶⌋)
    * — quantized at 1e-6 but exactly reproducible across engines and
    * reduction orders.
    */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5,
      queryMaxId: Long = 5, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = withNorm(embeddings.select(col(idCol), col(vecCol)), vecCol)
    val q = base.select(col(idCol).as("a_id"), col("vd").as("a_vd"), col("norm_m").as("a_norm"))
      .filter(col("a_id") < queryMaxId)
    val c = base.select(col(idCol).as("b_id"), col("vd").as("b_vd"), col("norm_m").as("b_norm"))
    val dots = q.join(c, col("a_id") =!= col("b_id"))
      .withColumn("dot_m", scaled_dot_micros(col("a_vd"), col("b_vd")))
      .withColumn("cosine", guardedCosine)
    val w = Window.partitionBy(col("a_id")).orderBy(col("cosine").desc, col("b_id"))
    dots.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), col("cosine"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }

  /** Scalar-quantized (SQ8) top-k — the memory-tier ANN variant: every
    * float is quantized to a small integer (`floor(x · 127)`, int8 range
    * for unit-bounded embeddings) and ranking runs entirely on integer
    * dot products of the quantized vectors. 4× smaller vectors in the
    * scan, integer arithmetic in the hot loop, and — because quantization
    * and dot are exact integer functions — bit-identical results on any
    * engine (this is SQ with a fixed symmetric scale; a learned per-block
    * scale drops in by swapping the quantizer expression). The recall
    * cost vs the exact ranking is measured in SimilaritySpec.
    */
  def sq8TopK(embeddings: DataFrame, k: Int = 5, queryMaxId: Long = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = embeddings.select(col(idCol), expr(
      s"transform(`$vecCol`, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127) AS BIGINT))")
      .as("qd"))
    val q = base.select(col(idCol).as("a_id"), col("qd").as("a_qd"))
      .filter(col("a_id") < queryMaxId)
    val c = base.select(col(idCol).as("b_id"), col("qd").as("b_qd"))
    val dots = q.join(c, col("a_id") =!= col("b_id"))
      // r19: codegen integer dot (FunctionsSpec pins ≡ the HOF fold)
      .withColumn("qdot",
        graft.functions.DotLong.dot_long(col("a_qd"), col("b_qd")))
    val w = Window.partitionBy(col("a_id")).orderBy(col("qdot").desc, col("b_id"))
    dots.withColumn("rn", row_number().over(w).cast("int")).filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), col("qdot"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }

  /** IVF-style top-k: identical math, but candidates are restricted to the
    * query's coarse cell (`label`). At 100 TB this is the difference
    * between scanning the corpus per query and scanning one cell.
    */
  def ivfTopK(embeddings: DataFrame, k: Int = 3, queryMaxId: Long = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    val base = withNorm(
      embeddings.select(col(idCol), col(vecCol), col(cellCol).as("cell")), vecCol)
    val q = base.select(col(idCol).as("a_id"), col("vd").as("a_vd"),
      col("norm_m").as("a_norm"), col("cell"))
      .filter(col("a_id") < queryMaxId)
    val c = base.select(col(idCol).as("b_id"), col("vd").as("b_vd"),
      col("norm_m").as("b_norm"), col("cell"))
    val dots = q.join(c, Seq("cell")).filter(col("a_id") =!= col("b_id"))
      .withColumn("dot_m", scaled_dot_micros(col("a_vd"), col("b_vd")))
      .withColumn("cosine", guardedCosine)
    val w = Window.partitionBy(col("a_id")).orderBy(col("cosine").desc, col("b_id"))
    dots.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("a_id"), col("cell"), col("b_id"), col("cosine"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): embeddings are partitioned into coarse cells
    * (`cellCol` — the pluggable stand-in for the paper's k-means
    * assignment; [[ivfTopK]] uses the same cells), pairwise cosine runs
    * ONLY within a cell, and of any pair above `threshold` the
    * higher-id member is flagged as a semantic duplicate (the
    * keep-lowest-id policy — swap in keep-best by joining a quality
    * score). Returns every row with `is_dup`; filter `!is_dup` for the
    * deduplicated corpus.
    *
    * Exactness: cosine compares in the same quantized-integer dot /
    * √norm·√norm arithmetic as [[bruteForceTopK]], with the threshold
    * test `dot_m ≥ τ·√a·√b` evaluated on the identical IEEE tree both
    * engines build — so the flag is bit-reproducible and DuckDB-
    * oracleable.
    *
    * Scale: the pairwise stage is the paper's trick — within-cell only.
    * Cell population is controlled by the clustering granularity (the
    * paper uses |corpus|/k ≈ 10⁴–10⁵ per cluster); the join shuffles on
    * cell, never forms the global cross product, and emits only
    * above-threshold pairs. Degenerate giant cells are the caller's
    * signal to re-cluster finer, exactly as in the paper.
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.92,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    val base = withNorm(
      embeddings.select(col(idCol), col(vecCol), col(cellCol).as("cell")), vecCol)
    val a = base.select(col("cell"), col(idCol).as("a_id"),
      col("vd").as("a_vd"), col("norm_m").as("a_norm"))
    val b = base.select(col("cell"), col(idCol).as("b_id"),
      col("vd").as("b_vd"), col("norm_m").as("b_norm"))
    val dropIds = a.join(b, Seq("cell")).filter(col("a_id") < col("b_id"))
      .withColumn("dot_m", scaled_dot_micros(col("a_vd"), col("b_vd")))
      // zero-norm guard: a degenerate vector (all |x| < 1e-3 quantizes to
      // norm 0) must never flag a NEIGHBOR as its duplicate — without it
      // the test collapses to dot_m ≥ 0 and unrelated rows get dropped
      .filter(col("a_norm") > 0L && col("b_norm") > 0L &&
        col("dot_m").cast("double") >=
        lit(threshold) * sqrt(col("a_norm").cast("double")) *
          sqrt(col("b_norm").cast("double")))
      .select(col("b_id").as("drop_id")).distinct()
    embeddings.select(col(idCol), col(cellCol).as("cell"))
      .join(dropIds.withColumn("__dup", lit(true)),
        col(idCol) === col("drop_id"), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** Product-quantization (PQ) top-k — the compressed-domain ANN tier
    * beyond [[sq8TopK]]: the vector splits into `m` contiguous subspaces,
    * each subspace is quantized to one of 16 codes, and candidate ranking
    * runs on CODE LOOKUPS instead of vector arithmetic (Jégou et al.,
    * TPAMI 2011 — asymmetric distance computation). Memory per vector in
    * the ranking scan: `m` small ints instead of d floats — at 100 TB the
    * difference between an in-memory candidate pass and a disk-bound one.
    *
    * The codebook is LEARNED from the data in one aggregation pass: cell
    * = 4 sign bits of the subspace's leading dimensions, centroid = the
    * per-dimension floor-mean of the cell's members in exact micro-int
    * arithmetic (BIGINT sums — no float accumulation), so training is
    * deterministic on any partitioning/reduction order. Search is
    * asymmetric: each query builds a 16-entry exact dot table per
    * subspace (|Q|·m·16 rows, broadcast), the corpus scan sums `m`
    * looked-up dots per candidate (map-side combined groupBy), the top
    * `k·refine` shortlist is re-ranked with the exact codegen'd
    * [[graft.functions.ScaledDotMicros]] cosine, and only the final
    * top-k survives. Recall vs [[bruteForceTopK]] is measured in
    * SimilaritySpec.
    */
  def pqTopK(embeddings: DataFrame, k: Int = 5, queryMaxId: Long = 5,
      m: Int = 8, dims: Int = 64, refine: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val dsub = dims / m
    require(dsub >= 4, "each subspace needs >= 4 dims for the 4 sign bits")
    val base = withNorm(embeddings.select(col(idCol), col(vecCol)), vecCol)
      // fail fast with a NAMED per-row error on a dims mismatch — without
      // it element_at past the end is an opaque ANSI abort (or, non-ANSI,
      // silent NULL codes and a corrupted shortlist), and longer vectors
      // would silently quantize only a prefix
      .filter(expr(s"""assert_true(size(vd) = $dims,
           concat('pqTopK: expected $dims-dim vectors, got ', size(vd),
                  ' at id ', `$idCol`))""").isNull)
      .withColumn("vm", expr("transform(vd, x -> CAST(FLOOR(x * 1000000) AS BIGINT))"))
    // ONE generator pass builds every (subspace, code, subvector) row —
    // the m-way unionAll alternative re-scans the corpus m times per use.
    // Recompute (2 scans: codebook + ADC) beats persisting here: at
    // 100 TB the exploded base is m× the corpus and caching it is the
    // memory bottleneck, while the scan is embarrassingly parallel.
    val subspaceGen = expr(
      s"""inline(transform(sequence(0, ${m - 1}), mi -> named_struct(
         |  'm_idx', CAST(mi AS INT),
         |  'code', CAST(
         |    IF(element_at(vm, CAST(mi * $dsub + 1 AS INT)) > 0, 1, 0) +
         |    IF(element_at(vm, CAST(mi * $dsub + 2 AS INT)) > 0, 2, 0) +
         |    IF(element_at(vm, CAST(mi * $dsub + 3 AS INT)) > 0, 4, 0) +
         |    IF(element_at(vm, CAST(mi * $dsub + 4 AS INT)) > 0, 8, 0) AS INT),
         |  'sub', slice(vm, CAST(mi * $dsub + 1 AS INT), $dsub))))""".stripMargin)
    val parts = base.select(col(idCol).as("b_id"), subspaceGen)
    // codebook: exact integer floor-mean per (subspace, code, dim) —
    // m·16·dsub rows, broadcast everywhere it is joined
    val codebook = parts
      .select(col("m_idx"), col("code"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy(col("m_idx"), col("code"), col("pos"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
      .groupBy(col("m_idx"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("centroid"))
    // asymmetric dot tables: exact query subvector x every centroid
    val qsubs = base.filter(col(idCol) < queryMaxId)
      .select(col(idCol).as("a_id"), subspaceGen)
      .select(col("a_id"), col("m_idx"), col("sub").as("qsub"))
    val dotTable = qsubs.join(broadcast(codebook), Seq("m_idx"))
      // r19: codegen integer dot (FunctionsSpec pins ≡ the HOF fold)
      .withColumn("dot",
        graft.functions.DotLong.dot_long(col("qsub"), col("centroid")))
      .select(col("a_id"), col("m_idx"), col("code"), col("dot"))
    // ADC scan: m code lookups per candidate, summed map-side
    val shortlist = parts.select(col("b_id"), col("m_idx"), col("code"))
      .join(broadcast(dotTable), Seq("m_idx", "code"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("dot")).as("adc"))
    val wAdc = Window.partitionBy(col("a_id")).orderBy(col("adc").desc, col("b_id"))
    val cands = shortlist.withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= k * refine)
      .select(col("a_id"), col("b_id"))
    // exact re-rank of the shortlist only
    val q = base.select(col(idCol).as("a_id"), col("vd").as("a_vd"), col("norm_m").as("a_norm"))
    val c = base.select(col(idCol).as("b_id"), col("vd").as("b_vd"), col("norm_m").as("b_norm"))
    val refined = cands.join(q, "a_id").join(c, "b_id")
      .withColumn("dot_m", scaled_dot_micros(col("a_vd"), col("b_vd")))
      .withColumn("cosine", guardedCosine)
    val w = Window.partitionBy(col("a_id")).orderBy(col("cosine").desc, col("b_id"))
    refined.withColumn("rn", row_number().over(w).cast("int")).filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), col("cosine"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }

  /** Sign-random-projection bucket key: `planes` pseudo-random hyperplanes
    * with deterministic ±1 Rademacher weights derived from murmur3 of
    * (plane, dimension). Bucket = packed sign bits. Pure per-row compute —
    * the only shuffle of [[lshTopK]] is the bucket-key join.
    */
  def srpBuckets(embeddings: DataFrame, planes: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    withNorm(embeddings.select(col(idCol), col(vecCol)), vecCol)
      .withColumn("bucket",
        graft.functions.SrpBucket.srp_bucket(col("vd"), planes))

  /** LSH-bucketed approximate top-k: exact cosine within the query's
    * bucket only. Recall < 1 by construction; the ScalaTest suite measures
    * it against [[bruteForceTopK]].
    */
  def lshTopK(embeddings: DataFrame, k: Int = 3, queryMaxId: Long = 5,
      planes: Int = 12, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = srpBuckets(embeddings, planes, idCol, vecCol)
    val q = base.select(col(idCol).as("a_id"), col("vd").as("a_vd"),
      col("norm_m").as("a_norm"), col("bucket")).filter(col("a_id") < queryMaxId)
    val c = base.select(col(idCol).as("b_id"), col("vd").as("b_vd"),
      col("norm_m").as("b_norm"), col("bucket"))
    val dots = q.join(c, Seq("bucket")).filter(col("a_id") =!= col("b_id"))
      .withColumn("dot_m", scaled_dot_micros(col("a_vd"), col("b_vd")))
      .withColumn("cosine", guardedCosine)
    val w = Window.partitionBy(col("a_id")).orderBy(col("cosine").desc, col("b_id"))
    dots.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("a_id"), col("bucket"), col("b_id"), col("cosine"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }
}
