package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators — the steps that turn a pile of curated
  * documents into the training mixture an LLM actually sees: deterministic
  * subsampling, weighted domain (source) mixing, and greedy sequence
  * packing into fixed context windows.
  *
  * The reference engine (xorbits_sql) has no counterpart — these extend the
  * LLM-pipeline surface the same way `Dedup`/`TextAnalysis` do. Everything
  * here is exact BIGINT arithmetic over the same integer permutation as
  * [[TextAnalysis.stratifiedSample]] ((id·2654435761) mod 4294967311), so
  * every sample is bit-reproducible on any engine and any cluster size —
  * DuckDB oracles compare hash-exact, and a re-run of a 1000-executor job
  * picks the identical mixture.
  */
object Mixing {

  /** The exact integer pseudo-random permutation used for all sampling
    * decisions: Knuth multiplicative hashing mod the first prime above
    * 2^32. BIGINT-exact, order-free, engine-free.
    *
    * Spelled as a modular decomposition, NOT the naive `id * C`: the raw
    * product overflows Long for ids ≥ ~3.5e9 — under Spark 4's default
    * ANSI mode that ABORTS the query, and with ANSI off it silently
    * wraps — exactly the corpus scale this module advertises. With
    * r = id mod M split into 16-bit halves, every intermediate stays
    * below 2^49 ((r div 2^16)·(C·2^16 mod M) + (r mod 2^16)·C), and the
    * modular identity makes the result bit-identical to the
    * mathematical (id·C) mod M at EVERY id — small-id oracles that
    * replay the naive product are unaffected.
    */
  def permute(id: Column): Column = {
    val M = 4294967311L // first prime above 2^32
    val C = 2654435761L // Knuth multiplicative constant
    val C16 = 2041035463L // (C * 2^16) mod M
    val r = pmod(id, lit(M)) // in [0, M) < 2^33, so arithmetic shift is exact
    pmod(shiftright(r, 16) * lit(C16) + r.bitwiseAND(lit(65535L)) * lit(C), lit(M))
  }

  /** Deterministic rate sampling WITHOUT a shuffle: keep a row iff its
    * permuted id falls below `keepPpm` parts-per-million of the permutation
    * modulus. The whole operator is one codegen'd per-row predicate — at
    * 100 TB this is the sampler that runs inside the scan (no window, no
    * aggregation, no state), at the cost of only approximating the target
    * rate (each row is an independent keep/drop; the realized fraction
    * concentrates around keepPpm/1e6 by construction of the permutation).
    * Use [[mixDomains]] when exact quotas matter.
    */
  def hashSample(df: DataFrame, keepPpm: Long, idCol: String = "doc_id"): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, "keepPpm must be in [0, 1e6]")
    df.filter(permute(col(idCol)) % lit(1000000L) < lit(keepPpm))
  }

  /** Deterministic train/validation/test split: each row's permuted id
    * lands in [0, 1e6) ppm space — `[0, trainPpm)` → train,
    * `[trainPpm, trainPpm+valPpm)` → validation, the rest → test. The
    * assignment is a pure per-row codegen'd expression (no shuffle, no
    * state, runs inside the scan at any corpus size), stable under
    * re-partitioning and across runs/engines, and adding documents never
    * moves an existing document between splits — the property that keeps
    * yesterday's held-out set held out after an ingest.
    */
  def splitTrainValTest(df: DataFrame, trainPpm: Long, valPpm: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L,
      "splitTrainValTest: ppm shares must be non-negative and sum <= 1e6")
    df.withColumn("split",
      ppmBands(permute(col(idCol)) % lit(1000000L), trainPpm, valPpm))
  }

  /** train/validation/test name from a slot in [0, 1e6) ppm space. */
  private def ppmBands(slot: Column, trainPpm: Long, valPpm: Long): Column =
    when(slot < lit(trainPpm), lit("train"))
      .when(slot < lit(trainPpm + valPpm), lit("validation"))
      .otherwise(lit("test"))

  /** LEAKAGE-FREE split: the ppm band is keyed on the CONTENT digest, not
    * the document id, so byte-identical documents land in the same split
    * by construction — [[splitLeakage]] on the result is zero by
    * definition, with no dedup pass and no shuffle (the key, the
    * permutation and the band are one per-row codegen expression inside
    * the scan). Near-duplicates still straddle (their digests differ);
    * pair them with [[splitLeakageNearDup]] or split on a cluster key.
    *
    * The content key is the first 15 hex digits of md5 parsed as BIGINT
    * (< 2^60, exact in a Long) — chosen over Spark's murmur3 `hash()`
    * because any engine can replay it (`conv(hex,16,10)` here,
    * `CAST('0x'||substr(md5,1,15) AS BIGINT)` in DuckDB), keeping the
    * assignment verifiable end-to-end.
    */
  def splitByContent(df: DataFrame, trainPpm: Long, valPpm: Long,
      textCol: String = "text"): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L,
      "splitByContent: ppm shares must be non-negative and sum <= 1e6")
    val key = expr(
      s"cast(conv(substring(md5(`$textCol`), 1, 15), 16, 10) as bigint)")
    df.withColumn("split",
      ppmBands(permute(key) % lit(1000000L), trainPpm, valPpm))
  }

  /** Cross-split leakage report: exact-duplicate documents that straddle
    * the [[splitTrainValTest]] boundary — the check a pipeline runs right
    * after splitting, because a validation document whose byte-identical
    * twin sits in train silently inflates every eval.
    *
    * One row per ordered split pair with `leaked_texts` (distinct
    * duplicated contents present in both splits) and `leaked_pairs`
    * (cross-split document pairs, Σ n_a·n_b over those contents). One
    * md5-keyed shuffle with map-side partial counts; the pair counts are
    * products of per-split multiplicities, so nothing pairwise is ever
    * materialized — at 100 TB this is the same single-aggregation shape
    * as exact dedup, not a join.
    */
  def splitLeakage(df: DataFrame, trainPpm: Long, valPpm: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val perHash = splitTrainValTest(df, trainPpm, valPpm, idCol)
      .select(md5(col(textCol)).as("h"), col("split"))
      .groupBy(col("h")).agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "validation", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    // all six statistics in ONE aggregation pass, then stacked to rows
    // (the same inline-struct pivot as Relational.profile) — three
    // separate .agg calls would rescan the corpus three times
    def texts(na: Column, nb: Column) =
      coalesce(sum(when(na > 0 && nb > 0, 1L).otherwise(0L)), lit(0L))
    def prs(na: Column, nb: Column) = coalesce(sum(na * nb), lit(0L))
    perHash.agg(
      texts(col("n_train"), col("n_val")).as("tv_texts"),
      prs(col("n_train"), col("n_val")).as("tv_pairs"),
      texts(col("n_train"), col("n_test")).as("tt_texts"),
      prs(col("n_train"), col("n_test")).as("tt_pairs"),
      texts(col("n_val"), col("n_test")).as("vt_texts"),
      prs(col("n_val"), col("n_test")).as("vt_pairs"))
      .select(expr(
        """inline(array(
          |  struct('train' AS split_a, 'validation' AS split_b,
          |         tv_texts AS leaked_texts, tv_pairs AS leaked_pairs),
          |  struct('train' AS split_a, 'test' AS split_b,
          |         tt_texts AS leaked_texts, tt_pairs AS leaked_pairs),
          |  struct('validation' AS split_a, 'test' AS split_b,
          |         vt_texts AS leaked_texts, vt_pairs AS leaked_pairs)))""".stripMargin))
  }

  /** Epoch/upsampling plan: given a TOTAL token budget and integer
    * mixture weights, how many passes (epochs) over each source the
    * training run needs — the planning step when the budget EXCEEDS the
    * corpus and sources must repeat ([[mixDomains]] handles the opposite,
    * downsampling, direction). All BIGINT: per-source target
    * `w_s·B div W`, epochs in ppm `target·10⁶ div tokens_s` (ceil'd
    * whole epochs alongside), so the plan is bit-identical on any engine
    * and any partitioning. One token rollup + a broadcast of the
    * weight table; sources with no weight are omitted.
    */
  def epochPlan(df: DataFrame, weights: DataFrame, budgetTokens: Long,
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = weights.toDF("__src", "__w").filter(col("__w") > 0)
    val sumw = w.agg(sum(col("__w")).as("__sumw"))
    val toks = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("corpus_tokens"))
    toks.join(broadcast(w), col("source") === col("__src"))
      .crossJoin(broadcast(sumw))
      .select(col("source"), col("corpus_tokens"),
        expr(s"__w * ${budgetTokens}L div __sumw").as("target_tokens"))
      .withColumn("epochs_ppm",
        expr("target_tokens * 1000000L div corpus_tokens"))
      .withColumn("whole_epochs",
        expr("(target_tokens + corpus_tokens - 1) div corpus_tokens"))
  }

  /** Packing-efficiency forecast: for each source and each candidate
    * context length, the sequence count and padding waste head-to-tail
    * packing ([[packSequences]]) would produce — the capacity-planning
    * query run before committing to a context window. Pure integer
    * arithmetic over ONE per-source token aggregation (the per-doc token
    * count folds map-side); candidate lengths expand from the aggregated
    * row, so the corpus is scanned once regardless of how many lengths
    * are evaluated.
    */
  def packingEfficiency(df: DataFrame, contextLens: Seq[Long],
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    require(contextLens.nonEmpty && contextLens.forall(_ > 0),
      "contextLens must be non-empty and positive")
    val totals = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("total_tokens"))
    val structs = contextLens.map(l =>
      s"""struct(${l}L AS context_len,
         |  (total_tokens + ${l - 1}L) div ${l}L AS n_sequences,
         |  ((total_tokens + ${l - 1}L) div ${l}L) * ${l}L - total_tokens
         |    AS padding_tokens)""".stripMargin.replace("\n", " ")).mkString(", ")
    totals.select(col("source"), col("total_tokens"),
      expr(s"inline(array($structs))"))
  }

  /** NEAR-duplicate cross-split leakage: [[splitLeakage]] catches only
    * byte-identical twins; this reports the document pairs above a
    * trigram-Jaccard threshold whose endpoints landed in different
    * splits — the leakage that actually inflates evals (a lightly edited
    * validation doc with a train near-twin). Pair discovery is the
    * LOSSLESS [[Dedup.prefixFilteredJaccardPairs]] (exact threshold-pair
    * set, no LSH recall gap), so the report is deterministic and
    * oracle-checkable; splits are the same shuffle-free permutation
    * assignment. One row per ordered split pair that leaks, with the
    * pair count and the worst (max) Jaccard.
    */
  def splitLeakageNearDup(df: DataFrame, trainPpm: Long, valPpm: Long,
      thresholdPpm: Long = 500000L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sp = splitTrainValTest(df.select(col(idCol)), trainPpm, valPpm, idCol)
      .select(col(idCol).as("__id"), col("split"))
    def rank(c: Column) =
      when(c === "train", 0).when(c === "validation", 1).otherwise(2)
    Dedup.prefixFilteredJaccardPairs(df, thresholdPpm, textCol)
      .join(sp.select(col("__id").as("a_id"), col("split").as("sa")), "a_id")
      .join(sp.select(col("__id").as("b_id"), col("split").as("sb")), "b_id")
      .filter(col("sa") =!= col("sb"))
      .select(
        when(rank(col("sa")) < rank(col("sb")), col("sa")).otherwise(col("sb")).as("split_a"),
        when(rank(col("sa")) < rank(col("sb")), col("sb")).otherwise(col("sa")).as("split_b"),
        col("jaccard"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("leaked_pairs"), max(col("jaccard")).as("max_jaccard"))
  }

  /** Weight-PROPORTIONAL deterministic sampling: each row keeps with its
    * own probability `weightPpm/1e6` (clamped to 1), decided by the same
    * exact integer permutation as [[hashSample]] — quality-weighted and
    * length-weighted corpus sampling in one codegen'd per-row predicate,
    * no shuffle, no state, reproducible on any engine. Inclusion
    * probability is exactly proportional to the weight; it is NOT a
    * fixed-size sample (see [[mixDomains]] for exact quotas).
    */
  def weightedSample(df: DataFrame, weightPpm: Column,
      idCol: String = "doc_id"): DataFrame =
    df.filter(permute(col(idCol)) % lit(1000000L) <
      least(weightPpm.cast("long"), lit(1000000L)))

  /** Weighted domain mixing: downsample each source so the surviving corpus
    * matches the target mixture `weights` (integer relative parts, e.g.
    * web=7, code=2, wiki=1) as closely as the available data allows, keeping
    * as many total rows as possible.
    *
    * Semantics (all BIGINT, truncating division, so both engines agree to
    * the bit): with n_s rows available in source s, weight w_s and
    * W = Σ w_s, the largest feasible total is T = min_s ⌊n_s·W / w_s⌋ and
    * each source keeps its m_s = ⌊w_s·T / W⌋ lowest-permutation rows
    * (m_s ≤ n_s follows from the floors). Sources absent from `weights`
    * (or with weight 0) are dropped — mixing is also how a pipeline
    * excludes a domain.
    *
    * Scale shape: the per-source count table is |sources| rows — the
    * quota computation is a broadcast-sized side plan, never a driver
    * collect. The corpus itself pays exactly one window shuffle on the
    * source key (the per-source ranking); skew relief for a dominant
    * source is the documented salting composition in SCALE.md.
    *
    * @param weights two columns: source value, INTEGER weight parts
    */
  def mixDomains(docs: DataFrame, weights: DataFrame,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val wdf = weights.toDF("__src", "__w").filter(col("__w") > 0)
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .join(broadcast(wdf), col(sourceCol) === col("__src"))
    val sumw = counts.agg(sum(col("__w")).as("__sumw")) // 1 row
    val totals = sumw.crossJoin(
      counts.crossJoin(broadcast(sumw))
        .agg(min(expr("__n * __sumw div __w")).as("__t"))) // 1 row: (W, T)
    val quota = counts.crossJoin(broadcast(totals))
      .select(col(sourceCol).as("__qsrc"),
        expr("__w * __t div __sumw").as("__m"))
    val rn = Window.partitionBy(col(sourceCol))
      .orderBy(permute(col(idCol)), col(idCol))
    docs.withColumn("__rn", row_number().over(rn).cast("long"))
      .join(broadcast(quota), col(sourceCol) === col("__qsrc"))
      .filter(col("__rn") <= col("__m"))
      .drop("__rn", "__qsrc", "__m")
  }

  /** Token-budget domain mixing: like [[mixDomains]] but quotas are in
    * TOKENS, the unit a training run actually budgets. Each source s with
    * weight w_s gets a token quota m_s = ⌊w_s·B / W⌋ (B = `budgetTokens`,
    * W = Σ w_s, BIGINT truncating division) and keeps its lowest-permutation
    * documents greedily while the running token count stays within the
    * quota: a document is kept iff its INCLUSIVE running sum ≤ m_s, so the
    * kept prefix never exceeds the quota (the first document longer than
    * the whole quota is dropped along with everything after it).
    *
    * Scale shape — two-phase exact prefix, NO corpus-sized per-source
    * window (a naive `sum().over(partitionBy(source))` is one serial task
    * per domain; with few domains that is the 100 TB bottleneck):
    *  1. each row lands in one of `permBuckets` ranges of the permutation
    *     value (a per-row codegen'd expression), and a map-side-combined
    *     aggregate yields per-(source, bucket) token sums — a table of at
    *     most |sources|·permBuckets rows;
    *  2. a window over THAT tiny aggregate finds, per source, which
    *     buckets fit wholly inside the quota (cumulative end ≤ m_s),
    *     which single bucket STRADDLES it, and the token offset carried
    *     into the straddling bucket;
    *  3. whole-bucket keeps/drops are a broadcast-join + filter
    *     (embarrassingly parallel); only the straddling bucket's rows —
    *     ~1/permBuckets of each source — pay the exact running-sum
    *     window, seeded with the carried offset.
    * Bucketing by permutation range preserves the greedy order exactly
    * (the bucket index is monotone in the permutation value), so the kept
    * set is bit-identical to the single-window formulation at any
    * partitioning. Tokens are whitespace counts ([[TextAnalysis]]
    * convention); for tokenizer-faithful budgets, feed the
    * `n_tokens_bpe` column from [[TextAnalysis.bpeEncode]] (a learned
    * merge list applied greedily, oracle-gated) in place of the
    * whitespace expression — every planner in this object is agnostic
    * to which token count column it sums.
    */
  def mixDomainsByTokens(docs: DataFrame, weights: DataFrame, budgetTokens: Long,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", permBuckets: Int = 4096): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    require(permBuckets > 0, "permBuckets must be positive")
    val wdf = weights.toDF("__src", "__w").filter(col("__w") > 0)
    val sumw = wdf.agg(sum(col("__w")).as("__sumw")) // 1 row
    val quota = wdf.crossJoin(broadcast(sumw))
      .select(col("__src").as("__qsrc"),
        expr(s"__w * ${budgetTokens}L div __sumw").as("__m"))
    // permutation values lie in [0, 4294967311): bucket = value div width.
    // Doubles are exact below 2^53, so floor(p / width) is the true div.
    val bucketWidth = 4294967311L / permBuckets + 1
    def bucketOf(id: Column): Column =
      floor(permute(id) / lit(bucketWidth.toDouble)).cast("long")
    val withTok = docs
      .withColumn("__nt", size(split(col(textCol), " ")).cast("long"))
      .withColumn("__bk", bucketOf(col(idCol)))
    // phase 1: per-(source, bucket) token totals — map-side combined
    val perBucket = withTok.groupBy(col(sourceCol).as("__psrc"), col("__bk").as("__pb"))
      .agg(sum(col("__nt")).as("__bt"))
    // phase 2: tiny per-source running sum over bucket totals → bucket plan
    val wb = Window.partitionBy(col("__psrc")).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketPlan = perBucket
      .join(broadcast(quota), col("__psrc") === col("__qsrc"))
      .withColumn("__cumEnd", sum(col("__bt")).over(wb))
      .withColumn("__off", col("__cumEnd") - col("__bt"))
      // 0 = bucket fits wholly (every row's inclusive sum ≤ m);
      // 1 = straddles (needs the exact window); dropped otherwise
      .withColumn("__st",
        when(col("__cumEnd") <= col("__m"), lit(0))
          .when(col("__off") <= col("__m"), lit(1)))
      .filter(col("__st").isNotNull)
      .select(col("__psrc"), col("__pb"), col("__m"), col("__off"), col("__st"))
    // phase 3: whole buckets by broadcast filter; exact window on the
    // straddling bucket only (partitionBy(source) there touches exactly
    // one bucket per source, so the serial region is bucket-sized)
    val tagged = withTok.join(broadcast(bucketPlan),
      col(sourceCol) === col("__psrc") && col("__bk") === col("__pb"))
    val wexact = Window.partitionBy(col(sourceCol))
      .orderBy(permute(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val working = Seq("__nt", "__bk", "__psrc", "__pb", "__m", "__off", "__st")
    val full = tagged.filter(col("__st") === 0).drop(working: _*)
    val boundary = tagged.filter(col("__st") === 1)
      .withColumn("__cum", col("__off") + sum(col("__nt")).over(wexact))
      .filter(col("__cum") <= col("__m"))
      .drop(working :+ "__cum": _*)
    full.unionByName(boundary)
  }

  /** Temperature-scaled domain sampling — the multilingual/multi-domain
    * rebalancing rule (sample domain d with probability ∝ n_d^α, the
    * α-temperature of mBERT/XLM-R and data-mixture work): α < 1 flattens
    * the natural distribution so head domains stop drowning the tail.
    * α is fixed at 1/2 (√n) so the weight is ONE correctly-rounded IEEE
    * op per domain — `w_m = ⌊√n_d · 10⁶⌋` as BIGINT — and every
    * downstream allocation stays in exact integer arithmetic:
    * `alloc_d = ⌊budgetDocs · w_m / Σw_m⌋`, capped at n_d. Returns the
    * per-domain allocation table (n_docs, weight, allocation); feed it
    * to [[mixDomains]] as the weight frame to materialize the sample.
    * Other temperatures drop in by swapping the weight expression for a
    * `pow`-based one (bit-reproducibility then depends on the platform's
    * pow, which is why √ is the default here).
    *
    * Scale: one map-side-combined count per domain; the allocation math
    * runs on the |domains|-row aggregate with the Σ broadcast — nothing
    * corpus-sized ever shuffles twice.
    */
  def temperatureMix(docs: DataFrame, budgetDocs: Long,
      sourceCol: String = "source"): DataFrame = {
    require(budgetDocs >= 0, "budgetDocs must be non-negative")
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_m",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000L).cast("double"))
          .cast("long"))
    val sumw = counts.agg(sum(col("w_m")).as("__sumw")) // 1 row
    counts.crossJoin(broadcast(sumw))
      .select(col(sourceCol), col("n_docs"), col("w_m"),
        least(expr(s"${budgetDocs}L * w_m div __sumw"), col("n_docs"))
          .as("allocation"))
  }

  /** Deterministic global shuffle + sharding — the last step before a
    * training run reads the corpus: every document gets a pseudo-random
    * but REPRODUCIBLE (shard, position) from the integer permutation, so
    * two runs (or two engines) lay out byte-identical shards with no RNG
    * state. shard = permute(id) mod numShards; position = rank of
    * permute(id) within the shard (ties impossible: the permutation is a
    * bijection mod 4294967311 for ids below it, and `idCol` breaks any
    * residual tie deterministically).
    *
    * Scale shape: one shuffle on the shard key + a per-shard sort — the
    * same cost as the `repartition(numShards).sortWithinPartitions`
    * a sharded writer pays anyway; compose with
    * `.write.partitionBy("shard")` (or `repartition(col("shard"))` +
    * per-partition files) to materialize training shards.
    */
  def shuffleShard(docs: DataFrame, numShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(permute(col(idCol)), col(idCol))
    docs
      .withColumn("shard", permute(col(idCol)) % lit(numShards.toLong))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Greedy sequence packing — the "concatenate then split every
    * `contextLen` tokens" construction of LLM training sequences. Documents
    * are laid head-to-tail in `idCol` order within each shard and each
    * receives its global token offset; a document starting at offset o
    * belongs to sequence ⌊o / contextLen⌋ at in-sequence position
    * o mod contextLen (it may spill into following sequences —
    * `end_seq_id` tells how far).
    *
    * Packing is SHARD-LOCAL by design (`shardCol`, default the source
    * column): a global head-to-tail order would be a single-partition
    * running sum — the classic scale killer — and training pipelines never
    * need cross-shard contiguity, only that every shard emits dense
    * fixed-length sequences. Each shard pays one window sort; shards pack
    * in parallel.
    */
  def packSequences(docs: DataFrame, contextLen: Int,
      shardCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr(s"start_offset div ${contextLen}L"))
      .withColumn("seq_pos", col("start_offset") % lit(contextLen.toLong))
      .withColumn("end_seq_id",
        expr(s"(start_offset + n_tokens - 1L) div ${contextLen}L"))
      .select(col(shardCol), col(idCol), col("n_tokens"), col("start_offset"),
        col("seq_id"), col("seq_pos"), col("end_seq_id"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023, arXiv:2302.03169): score every raw
    * document by how much its token distribution resembles a TARGET
    * slice, so the mixture can up-sample target-like data. The paper
    * weights documents by Π p_target(f)/p_raw(f) over hashed n-gram
    * features; this gate uses the exact unigram vocabulary and a
    * fixed-point per-token ratio so the score is integer arithmetic,
    * bit-reproducible on any engine and partitioning:
    *
    *   ppm(t)   = floor(1e6 · (target_count(t)+1) · raw_total
    *                        / ((raw_count(t)+1) · target_total))
    *   score(d) = Σ_occurrences ppm(t)   (add-one smoothing both sides)
    *
    * The 1e6·(tc+1)·raw_total product is computed in DECIMAL(38,0) —
    * BIGINT would overflow once (tgt_c+1)·raw_total > ~9.2·10¹⁸, which a
    * billion-token corpus with a realistic target slice already crosses;
    * decimal holds exactly to ~10¹⁵ raw tokens (product ≤ 1e6·raw²
    * < 10³⁸), and the final per-token ppm fits BIGINT comfortably.
    * Production beyond that moves the ratio to log-space doubles
    * (order-independent per-token, summed in one pass) — the selection
    * RANKING is what matters, not the absolute weight. Scale shape: one
    * explode feeding a map-side-combined token count (raw and target
    * counted in the SAME aggregation — one counted shuffle; the probe
    * side re-scans the corpus rather than caching the exploded frame,
    * the cheaper trade at corpus scale), a broadcast 1-row totals frame,
    * a vocab-sized ratio table BROADCAST back onto the token stream (a
    * shuffled join would funnel every stopword occurrence to one
    * partition), and one final per-doc aggregate. Documents with NULL
    * text score 0 over 0 tokens — present in the output, never silently
    * dropped.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol), isTarget.as("is_target"),
      explode(split(col(textCol), " ")).as("t"))
    val counts = tok.groupBy(col("t")).agg(
      count(lit(1)).as("raw_c"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt_c"))
    // fail fast (with a NAMED error, not a DIV-by-zero or silent NULLs)
    // when the target slice matches nothing — the ratio is undefined then.
    // assert_true rides the broadcast 1-row totals frame: zero extra pass.
    val totals = counts.agg(
        sum(col("raw_c")).as("raw_total"), sum(col("tgt_c")).as("tgt_total"))
      .filter(expr(
        "assert_true(tgt_total > 0, 'dsirWeights: target slice is empty')").isNull)
    val ppm = counts.crossJoin(broadcast(totals))
      .withColumn("ppm", expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * (tgt_c + 1L) * raw_total)
          | DIV (CAST(raw_c + 1L AS DECIMAL(38,0)) * tgt_total) AS BIGINT)"""
          .stripMargin.replace("\n", "")))
      // beyond the documented ~1e15-raw-token bound the decimal product
      // overflows to NULL with ANSI off, and sum(ppm) would silently SKIP
      // those tokens — scores would skew quietly. Fail loudly instead,
      // symmetric with the named empty-target assert above; the predicate
      // rides the vocab-sized frame (one boolean per distinct token).
      .filter(expr(
        "assert_true(ppm IS NOT NULL, 'dsirWeights: ppm ratio overflowed DECIMAL(38,0) — corpus exceeds the exact-arithmetic bound; use a log-space variant')").isNull)
      .select(col("t"), col("ppm"))
    val scored = tok.join(broadcast(ppm), "t")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("ppm")).as("score_ppm"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_ppm"), lit(0L)).as("score_ppm"))
      .orderBy(col(idCol))
  }

  /** Curriculum schedule plan — the staging report a curriculum-training
    * pipeline publishes before a run: every document gets an exact
    * integer difficulty score, documents are binned into fixed difficulty
    * BANDS, and the plan reports per (source, band) volume so the trainer
    * can stage easy→hard. The difficulty here is a deterministic stand-in
    * (production swaps in an LM-loss or teacher-score column — the plan
    * shape is identical):
    *
    *   len_ppm  = 1e6 · min(n_tok, 512) / 512      (longer is harder)
    *   rep_ppm  = 1e6 − 1e6 · n_distinct / n_tok   (repetitive is harder)
    *   difficulty_ppm = (len_ppm + rep_ppm) div 2
    *
    * Bands are FIXED thresholds (`difficulty_ppm div (1e6 / bands)`,
    * clamped to bands−1), NOT per-source ntile: fixed-threshold binning
    * is a pure per-row map feeding one counted groupBy — no per-source
    * sort, no window, nothing that degrades when one source holds 10 TB
    * (the ntile variant is the op_histogram_equifreq trade; its approx
    * sibling shows the boundary-first pattern if data-relative bands are
    * ever needed). NULL text coalesces to '' before the split, and
    * `split('', ' ')` is `['']` — one token, one distinct token — so a
    * NULL/empty document scores len_ppm = 1953, rep_ppm = 0, difficulty
    * 976 and lands in band 0 (the EASIEST band), never dropped; the
    * DuckDB oracle mirrors the same coalesce so both engines agree.
    */
  def curriculumPlan(docs: DataFrame, bands: Int = 4,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(bands > 0, "bands must be positive")
    val width = 1000000L / bands
    val perRow = docs
      .select(col(srcCol).as("source"),
        split(coalesce(col(textCol), lit("")), " ").as("w"))
      .select(col("source"),
        size(col("w")).cast("long").as("n_tok"),
        size(array_distinct(col("w"))).cast("long").as("n_dis"))
      // exact integer fixed point end to end (div, never double /);
      // n_tok ≥ 1 always — split('') is [''] — so the ratio is defined
      .select(col("source"), col("n_tok"),
        expr("""((1000000L * least(n_tok, 512L) div 512L) +
               |  (1000000L - 1000000L * n_dis div n_tok)) div 2L"""
          .stripMargin).as("difficulty_ppm"))
    perRow
      .withColumn("band",
        expr(s"least(difficulty_ppm div ${width}L, ${bands - 1}L)"))
      .groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("difficulty_ppm")).as("min_difficulty_ppm"),
        max(col("difficulty_ppm")).as("max_difficulty_ppm"))
      .orderBy(col("source"), col("band"))
  }

  /** Corpus concentration report — the diversity card a pipeline checks
    * before training: per-source token share, the cumulative share of the
    * largest sources, and the Herfindahl–Hirschman index (HHI, Σ share²)
    * as the single concentration number. All exact integer ppm so any two
    * engines agree bit-for-bit. Scale shape: one map-side-combined
    * groupBy collapses the corpus to |sources| rows; the rank/cumulative
    * windows and the HHI rollup run on that collapsed frame (a few
    * hundred rows at any corpus size), and the 1-row totals/HHI frame is
    * broadcast back — the corpus is scanned exactly once.
    */
  def corpusConcentration(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val perSource = docs
      .select(col(srcCol).as("source"),
        when(col(textCol).isNull, 0L)
          .otherwise(size(split(col(textCol), " "))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val totals = perSource.agg(sum(col("n_tokens")).as("total_tokens"))
    // a zero-token corpus (every text NULL/empty) must yield a degenerate
    // report (all shares 0, HHI 0), not an ANSI DIVIDE_BY_ZERO abort
    val shared = perSource.crossJoin(broadcast(totals))
      .withColumn("share_ppm",
        expr("IF(total_tokens = 0, 0L, 1000000L * n_tokens div total_tokens)"))
    val ranked = shared
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_tokens").desc, col("source"))).cast("long"))
      .withColumn("cum_share_ppm", sum(col("share_ppm")).over(
        Window.orderBy(col("n_tokens").desc, col("source"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // HHI from the integer shares: Σ share_ppm² div 1e6 (10 000 = one
    // source owns everything · ppm scale)
    val hhi = shared.agg(
      expr("sum(share_ppm * share_ppm) div 1000000L").as("hhi_ppm"))
    ranked.crossJoin(broadcast(hhi))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share_ppm"),
        col("rank"), col("cum_share_ppm"), col("hhi_ppm"))
      .orderBy(col("rank"))
  }
}
