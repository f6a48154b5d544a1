package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and chop the token stream into fixed-size context
  * windows ("concat-and-chunk" — the packing used for GPT-style training
  * corpora). Each document maps to the sequence (and offset) where its
  * first token lands; `spans_boundary` marks documents split across two
  * windows (the fraction a loader would truncate or mask).
  *
  * Scale: the naive formulation is a running sum over a GLOBAL order — a
  * single-partition window that serializes the corpus through one task.
  * This implementation is the classic two-level scan instead:
  *   1. per-block cumulative sums (window partitioned by `block`, docs
  *      shuffle by block — fully parallel);
  *   2. block TOTALS (one row per block) prefix-summed in a single tiny
  *      partition — the only serial step is O(n_blocks), not O(n_docs);
  *   3. offsets join back by block key (block table is small: Catalyst
  *      broadcasts it).
  * Exactly a parallel prefix-scan on top of relational ops; identical
  * output to the single-window formulation the DuckDB oracle runs.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Int, blockSize: Long = 4096,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val base = df.select(col(idCol).cast("long").as("doc_id") +:
      col(tokensCol).cast("long").as("n_tokens") +: carryCols.map(col): _*)
      .withColumn("block", floor(col("doc_id") / blockSize))
    // pass 1: parallel per-block running sums. ROWS frame, not the default
    // RANGE: with RANGE, rows tying on doc_id are peers that would each
    // see the whole peer group's sum — overlapping placements instead of
    // sequential ones (ids are expected unique; the ROWS frame keeps the
    // arithmetic sequential even when they are not)
    val wIn = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = base.withColumn("cum_in_block", sum("n_tokens").over(wIn))
    // pass 2: prefix-sum of block totals — one row per block, so the
    // deliberately-unpartitioned window is O(n_blocks) serial work
    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("block").agg(sum("n_tokens").as("tot"))
      .withColumn("block_offset", coalesce(sum("tot").over(wBlocks), lit(0L)))
      .select("block", "block_offset")
    // pass 3: join offsets back and place each doc in the token stream
    val cumBefore = col("block_offset") + col("cum_in_block") - col("n_tokens")
    val lastTok = col("cum_before") + col("n_tokens") - 1
    withCum.join(offsets, Seq("block"))
      .withColumn("cum_before", cumBefore)
      .withColumn("seq_id", floor(col("cum_before") / budget))
      .withColumn("seq_offset", col("cum_before") % budget)
      .withColumn("spans_boundary",
        col("n_tokens") > 0 && floor(lastTok / budget) > col("seq_id"))
      .select(("doc_id" +: "n_tokens" +: "seq_id" +: "seq_offset" +:
        "spans_boundary" +: carryCols).map(col): _*)
  }

  /** Document-aware FIRST-FIT-DECREASING packing: every document stays
    * WHOLE — the packing used when cross-document attention (or mid-doc
    * truncation) is unacceptable, versus [[packSequences]]' concat-and-
    * chunk which splits docs across window boundaries. Docs are dealt to
    * `nShards` deterministic md5 shards (uniform, partition-layout-
    * independent — the [[Sampling.hashFraction]] family), each shard is
    * sorted by (length desc, doc_id) and packed by exact greedy FFD into
    * bins of `budget` tokens via the native [[graft.functions.FfdPack]]
    * kernel; a doc longer than the budget opens its own forever-singleton
    * bin. Deterministic end to end (hash shard, total sort order, greedy
    * placement), so a SQL oracle reproduces every placement exactly.
    *
    * Scale shape: one shuffle keyed by shard; the sequential FFD core runs
    * per shard over a BOUNDED collected list (choose nShards so shards
    * stay bounded — packing at corpus scale is per-output-shard anyway,
    * and a uniform random shard packs as well as global FFD in
    * expectation). FFD guarantee per shard: at most one bin at or below
    * half occupancy, so total bins < 2·optimal + 1 (the classic 11/9·OPT
    * bound holds per shard for docs within budget).
    *
    * Returns (doc_id, n_tokens, shard, bin) — bins are 1-based per shard. */
  def packDocumentsFfd(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.graft.bridge
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % nShards).cast("int"))
    val packed = bridge.column(graft.functions.FfdPack(
      bridge.expression(sort_array(collect_list(
        struct((-col("n_tokens")).as("neg_len"), col("doc_id"))))), budget))
    base.groupBy("shard")
      .agg(packed.as("placed"))
      .select(col("shard"), explode(col("placed")).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("p.n_tokens").as("n_tokens"),
        col("shard"), col("p.bin").as("bin"))
  }

  /** Deterministic global training-order shuffle: every document gets a
    * reproducible position in a seed-keyed pseudo-random total order, plus
    * a shard assignment — the "shuffle once, stream shards" step before a
    * training run. The order key is md5(seed:doc_id), a pure function of
    * (seed, id): re-running, re-partitioning, or switching engines yields
    * the identical permutation, and a new seed yields an independent one.
    *
    * Positions come from the same two-level prefix scan as
    * [[packSequences]] — a global row_number would serialize the corpus
    * through one task. Here the block is the first two hex chars of the
    * order key (256 near-uniform blocks by construction, no equi-depth
    * binning needed): per-block ranks are a partitioned window over
    * (key, id); block offsets prefix-sum the 256 block COUNTS in a tiny
    * serial window; position = offset + in-block rank. Because the block
    * prefix IS the leading bytes of the sort key, block order concatenated
    * with in-block order equals the global (key, id) order exactly.
    *
    * Shard = pos % nShards deals the SHUFFLED order round-robin, so shards
    * are simultaneously pseudo-random in content and balanced to ±1 in
    * size — a plain hash-mod-shards gives binomial imbalance instead. */
  def shuffleAssign(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    // order_key must come from the ALIASED doc_id: after the select only
    // "doc_id" resolves, so col(idCol) would throw for any other id name
    val base = df.select(col(idCol).cast("long").as("doc_id"))
      .withColumn("order_key",
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))))
      .withColumn("block", substring(col("order_key"), 1, 2))
    val wIn = Window.partitionBy("block").orderBy("order_key", "doc_id")
    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("block").agg(count(lit(1)).as("cnt"))
      .withColumn("block_offset", coalesce(sum("cnt").over(wBlocks), lit(0L)))
      .select("block", "block_offset")
    base.withColumn("rank_in_block", row_number().over(wIn))
      .join(offsets, Seq("block"))
      .withColumn("pos", col("block_offset") + col("rank_in_block") - 1)
      .withColumn("shard", (col("pos") % nShards).cast("int"))
      .select("doc_id", "order_key", "pos", "shard")
  }

  /** Curriculum training order: a global position for every document such
    * that all of phase p precedes all of phase p+1, and WITHIN a phase the
    * order is the seed-keyed md5 shuffle of [[shuffleAssign]] — the staged
    * data schedule of anneal-to-quality training runs (generic phases
    * first, the highest-quality phase last), with the reproducibility
    * contract of every ordering here: position is a pure function of
    * (seed, phase, doc_id).
    *
    * Same two-level prefix scan as [[shuffleAssign]], with the phase
    * prepended to the block key: per-(phase, md5-prefix-block) local ranks
    * in parallel, then block offsets via one window over the
    * n_phases·256-row block table — equivalent to `row_number() OVER
    * (ORDER BY phase, order_key, id)` without the single-task corpus
    * sort (the block is a PREFIX of the order key, so block order is
    * consistent with the global order). Output: (doc_id, phase,
    * order_key, pos, carryCols...) — carry columns ride through the scan
    * like [[packSequences]]' (a join-back would re-evaluate the input
    * subtree). */
  def curriculumOrder(df: DataFrame, idCol: String, phaseCol: String,
      seed: String, carryCols: Seq[String] = Nil): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id") +:
        col(phaseCol).cast("int").as("phase") +: carryCols.map(col): _*)
      .withColumn("order_key",
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))))
      .withColumn("block", substring(col("order_key"), 1, 2))
    val wIn = Window.partitionBy("phase", "block")
      .orderBy("order_key", "doc_id")
    val wBlocks = Window.orderBy("phase", "block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("phase", "block").agg(count(lit(1)).as("cnt"))
      .withColumn("block_offset", coalesce(sum("cnt").over(wBlocks), lit(0L)))
      .select("phase", "block", "block_offset")
    base.withColumn("rank_in_block", row_number().over(wIn))
      .join(offsets, Seq("phase", "block"))
      .withColumn("pos", col("block_offset") + col("rank_in_block") - 1)
      .select(("doc_id" +: "phase" +: "order_key" +: "pos" +:
        carryCols).map(col): _*)
  }
}

/** Deterministic hash-based sampling for training-data mixing: the keep
  * decision is a pure function of the row key, so a sample is reproducible
  * across runs, engines, and partition layouts (no RNG state), survives
  * re-partitioning, and composes — nested rates select nested subsets,
  * exactly like the md5 split in `doc_split_assign`.
  */
object Sampling {

  /** 16^15 = 2^60: the size of the 15-hex-char md5 prefix space. */
  private val Space60 = 1152921504606846976.0d

  /** Uniform fraction in [0,1) from the md5 of the key — arithmetic-only,
    * identical in any engine with md5 (DuckDB: ('0x' || prefix)::BIGINT). */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") / lit(Space60)

  /** Per-stratum downsampling: keep a row iff its hash fraction falls
    * below the stratum's rate. Rates compile to a CASE chain evaluated in
    * sorted-key order (deterministic plan, no lookup table, no shuffle —
    * the filter is a pure projection that pushes to the scan). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1) &&
      defaultRate >= 0 && defaultRate <= 1, "rates must be in [0, 1]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) => when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashFraction(col(keyCol)) < rate)
  }

  /** Temperature-flattened mixture rebalancing (the multilingual/domain
    * mixing rule from the mBERT/XLM-R lineage): the kept share of stratum
    * s is proportional to n_s^tau, so tau < 1 flattens the mixture toward
    * rare strata while an overall `keepFraction` of the corpus survives —
    *
    *   rate_s = min(1, (n_s^tau / Σ_t n_t^tau) * keepFraction * N / n_s)
    *
    * Stratum counts are a bounded driver-side aggregate (|strata| rows,
    * metadata-sized — the same contract as approx-quantile cuts); the
    * keep decision itself stays the deterministic per-row hash filter, so
    * the sample is reproducible across engines and partitionings.
    * tau = 0.5 is computed via sqrt (IEEE-exact, so a SQL oracle
    * reproduces the rates bit-for-bit); other taus use pow. */
  /** Mixture-to-TOKEN-BUDGET sampling — the practical form of a
    * data-mixing config ("this run gets B_s tokens of domain s"): each
    * budgeted stratum is downsampled at rate min(1, B_s / T_s) where T_s
    * is the stratum's total token count, so the kept token mass hits the
    * budget in expectation; strata without an explicit budget keep
    * `defaultRate`. T_s comes from a bounded |strata|-row aggregate (the
    * [[temperatureRebalance]] contract — metadata-sized, never the
    * corpus); the keep decision stays the deterministic per-row md5
    * filter, so the sample is reproducible across engines, runs, and
    * partition layouts, and nests across budget increases like every
    * hash sample here. Rates are single correctly-rounded divisions of
    * exactly-representable integers — bit-identical in any engine. A
    * budget at or above T_s keeps the stratum whole (rate clamps to 1). */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
      tokensCol: String, budgets: Map[String, Long],
      defaultRate: Double = 1.0): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(defaultRate >= 0 && defaultRate <= 1,
      s"defaultRate must be in [0, 1], got $defaultRate")
    val totals = df.filter(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(sum(col(tokensCol).cast("long")).as("__tok"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val rates = budgets.map { case (s, b) =>
      // a budgeted stratum absent from the corpus contributes nothing
      // either way; rate 1.0 keeps the CASE chain total
      s -> totals.get(s).map(t => math.min(1.0, b.toDouble / t)).getOrElse(1.0)
    }
    stratifiedSample(df, keyCol, strataCol, rates, defaultRate)
  }

  /** Per-domain document-COUNT cap (the RefinedWeb-style curation rule:
    * no single site may contribute more than `cap` documents): keep, for
    * each domain, the `cap` rows with the smallest md5(key) — a
    * deterministic "random `cap` per domain" that is reproducible across
    * engines, runs, and partition layouts, and nests under cap increases
    * (the kept set for cap=K is a subset of cap=K+1's).
    *
    * Scale: top-K per group via ONE window over the whole corpus
    * partitioned by domain would sort each domain in a single task — a
    * head domain holding 10% of a 100 TB corpus serializes through one
    * executor. Two-level exact top-K instead:
    *   1. local: window over (domain, salt) — `nSalts` hash-split slices
    *     of each domain, so the biggest sort partition is ~1/nSalts of the
    *     head domain — keep each slice's top `cap`;
    *   2. global: window over domain on the survivors — at most
    *     nSalts*cap rows per domain, metadata-sized whatever the corpus.
    * Exact by pigeonhole: any row in a domain's global top-cap is top-cap
    * within its own slice, so level 1 never discards a final keeper.
    * Output: key, domain, rank (1-based hash-order rank within domain). */
  def domainDocCap(df: DataFrame, keyCol: String, domainCol: String,
      cap: Int, nSalts: Int = 16): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val h = md5(col(keyCol).cast("string"))
    val hashed = df.filter(col(domainCol).isNotNull)
      .select(col(keyCol), col(domainCol), h.as("__h"),
        pmod(crc32(col(keyCol).cast("string")), lit(nSalts)).as("__salt"))
    val local = Window.partitionBy(col(domainCol), col("__salt"))
      .orderBy(col("__h"), col(keyCol))
    val global = Window.partitionBy(col(domainCol))
      .orderBy(col("__h"), col(keyCol))
    hashed
      .withColumn("__rl", row_number().over(local))
      .filter(col("__rl") <= cap)
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= cap)
      .select(col(keyCol), col(domainCol), col("rank"))
  }

  /** Per-domain SHARE cap (the rate form of domain capping: no domain may
    * exceed `maxShare` of the kept corpus' input share): domains over the
    * share are downsampled at rate maxShare*N/n_s, domains under it keep
    * everything; the keep decision stays the deterministic per-row md5
    * filter, so membership is bit-reproducible in any engine.
    *
    * Unlike the language-mixing samplers ([[stratifiedSample]] and
    * friends), whose strata are tens of languages and whose rates are a
    * caller-supplied map compiled to a CASE chain, DOMAIN cardinality is
    * web-scale (millions of hosts) — so the rates here stay a DataFrame
    * end to end: a per-domain count aggregate, a 1-row total joined on,
    * and a rates join back to the corpus (domain-count-sized — AQE
    * broadcasts it while it fits and degrades to a shuffle join when it
    * doesn't). Nothing domain-cardinality-sized ever reaches the driver.
    * Null domains are dropped (they match no rate row — the
    * defaultRate = 0 convention of the mixing samplers). Rate arithmetic
    * is (maxShare * N) / n_s left-to-right in doubles, reproducible
    * bit-for-bit by a SQL oracle. */
  def domainShareCap(df: DataFrame, keyCol: String, domainCol: String,
      maxShare: Double): DataFrame = {
    require(maxShare > 0 && maxShare <= 1,
      s"maxShare must be in (0, 1], got $maxShare")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(domainCol).agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum("__n").as("__tot"))
    val rates = counts.crossJoin(total)
      .select(col(domainCol),
        least(lit(1.0), lit(maxShare) * col("__tot").cast("double")
          / col("__n").cast("double")).as("__rate"))
    df.join(rates, Seq(domainCol))
      .filter(hashFraction(col(keyCol)) < col("__rate"))
      .drop("__rate")
  }

  def temperatureRebalance(df: DataFrame, keyCol: String, strataCol: String,
      tau: Double = 0.5, keepFraction: Double = 0.5): DataFrame = {
    require(tau > 0 && tau <= 1, s"need 0 < tau <= 1, got $tau")
    require(keepFraction > 0 && keepFraction <= 1,
      s"need 0 < keepFraction <= 1, got $keepFraction")
    def flat(n: Double): Double =
      if (tau == 0.5) math.sqrt(n) else math.pow(n, tau)
    // null strata are dropped (they could never be kept anyway — the
    // CASE chain's equality never matches null) and excluded from the
    // totals so they don't dilute every real stratum's rate
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.get(0).toString -> r.getLong(1))
      .sortBy(_._1)
    require(counts.nonEmpty, "cannot rebalance an empty corpus")
    val total = counts.map(_._2).sum.toDouble
    val flatTotal = counts.map { case (_, n) => flat(n.toDouble) }.sum
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, flat(n.toDouble) / flatTotal * (keepFraction * total) / n)
    }.toMap
    stratifiedSample(df, keyCol, strataCol, rates, defaultRate = 0.0)
  }

  /** Budget WATERFILLING mixture allocation — the planning step a data
    * mix actually needs when target weights meet finite domains: allocate
    * a global token `budget` across strata proportional to `weights`, but
    * no stratum can contribute more tokens than it HAS; the mass a small
    * stratum cannot absorb spills over to the others (still
    * weight-proportionally) instead of silently shrinking the run.
    * Formally: alloc_s = min(n_s, λ·w_s) with the unique λ ≥ 0 making
    * Σ alloc_s = min(budget, Σ n_s) — the classic waterfill.
    *
    * λ is found without iteration: sorted by capacity-per-weight n_s/w_s
    * ascending, the saturated strata form a PREFIX, and stratum s
    * saturates iff n_s·(W − cumW) ≤ (budget − cumN)·w_s over the prefix
    * sums before it — an INTEGER cross-multiplied test, like every
    * rate decision in this object, so the verdicts are bit-reproducible
    * in any engine; λ itself is a single division of exact integer sums
    * taken AFTER the verdicts. Strata without a positive weight are
    * excluded from the fill and reported at rate 0.
    *
    * Scale shape: ONE key-partitioned token aggregation over the corpus,
    * collected at |strata| rows (the bounded-metadata contract of the
    * mixing samplers above — tens of languages/sources, never web-scale
    * domains; [[temperatureRebalance]] makes the same trade), then the
    * fill is a driver-side fold over those rows and the allocation table
    * a local relation — an earlier engine-side formulation re-evaluated
    * the corpus aggregate subtree per reference (5 scans in the plan).
    * Returns one row per stratum: (strataCol, n_tokens, weight,
    * saturated, rate, alloc_tokens); feed `rate` to [[stratifiedSample]]
    * (or the md5 filter directly) to materialize the sample. */
  def waterfillAllocation(df: DataFrame, strataCol: String, tokensCol: String,
      weights: Map[String, Long], budget: Long): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    require(budget >= 0, s"budget must be non-negative, got $budget")
    // the same scaled-HALF_UP rounding as Spark's round(c*1e6, 0)/1e6 and
    // DuckDB's round(x, 6) (positive domain), so the local relation is
    // bit-identical to the engine-side/oracle arithmetic
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(sum(col(tokensCol).cast("long")).as("__n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).sortBy(_._1)
    val active = counts
      .map { case (s, n) => (s, n, weights.getOrElse(s, 0L)) }
      .filter(_._3 > 0)
    val wTot = active.map(_._3).sum
    // saturation order: capacity-per-weight ascending; the saturated
    // strata form a prefix, and each verdict is an integer
    // cross-multiplied test against the prefix sums before the row
    var cumN = 0L; var cumW = 0L
    val verdicts = active
      .sortBy { case (s, n, w) => (n.toDouble / w, s) }
      .map { case (s, n, w) =>
        val isSat = n * (wTot - cumW) <= (budget - cumN) * w
        cumN += n; cumW += w
        s -> isSat
      }.toMap
    val lamN = budget - active.collect { case (s, n, _) if verdicts(s) => n }.sum
    val lamD = wTot - active.collect { case (s, _, w) if verdicts(s) => w }.sum
    val rows = counts.map { case (s, n) =>
      val w = weights.getOrElse(s, 0L)
      if (w <= 0) (s, n, w, false, 0.0, 0.0)
      else if (verdicts(s)) (s, n, w, true, 1.0, n.toDouble)
      else (s, n, w, false,
        r6((lamN * w).toDouble / (lamD * n)),
        r6((lamN * w).toDouble / lamD))
    }
    rows.toSeq
      .toDF(strataCol, "n_tokens", "weight", "saturated", "rate",
        "alloc_tokens")
  }

  /** Epoch-aware UP-sampling plan — the repetition side of a data mix
    * (the Llama/DoReMi recipe: small high-value strata are seen for
    * several epochs while the head stays at one): stratum s with token
    * budget B_s above its supply T_s repeats at
    *
    *   rate_s = min(B_s / T_s, maxEpochs)
    *
    * and every document in it appears floor(rate_s) times, plus once more
    * iff its md5 fraction falls below frac(rate_s) — so the emitted token
    * mass hits the budget in expectation and the repetition cap bounds
    * memorization exposure. A budget BELOW supply degrades to plain
    * downsampling (0-or-1 epochs — [[tokenBudgetSample]]'s semantics),
    * and strata without a budget pass through at exactly one epoch, so
    * one operator expresses the whole mixture plan. Output: one row per
    * (document, epoch) with `epoch` in 1..n — the materialized training
    * manifest a shuffle/pack stage consumes.
    *
    * Determinism contract (the discipline of every sampler here): T_s is
    * a bounded |strata|-row aggregate; rate_s is ONE correctly-rounded
    * division of exact longs, its floor/frac split is exact IEEE
    * arithmetic, and the extra-epoch decision is the per-row md5 filter
    * under a distinct salt (`:epoch`) so it decorrelates from every other
    * sampler's keep decision on the same keys. A SQL oracle reproduces
    * membership AND multiplicity bit-for-bit. Scale shape: the explode
    * multiplies rows by a per-stratum constant ≤ maxEpochs — output is
    * O(rate·corpus), never quadratic — and everything row-wise stays in
    * whole-stage codegen. */
  def epochUpsample(df: DataFrame, keyCol: String, strataCol: String,
      tokensCol: String, budgets: Map[String, Long],
      maxEpochs: Int = 4): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val totals = df.filter(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(sum(col(tokensCol).cast("long")).as("__tok"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val rates = budgets.flatMap { case (s, b) =>
      // a budgeted stratum absent from the corpus has nothing to repeat
      totals.get(s).map(t => s -> math.min(b.toDouble / t, maxEpochs.toDouble))
    }
    // floor/frac split driver-side on the SAME doubles the oracle
    // computes (floor and subtraction are exact), embedded as literals
    val fullCol = rates.toSeq.sortBy(_._1).foldLeft(lit(1L)) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(math.floor(r).toLong)).otherwise(acc)
    }
    val fracCol = rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(r - math.floor(r))).otherwise(acc)
    }
    val extra = (hashFraction(concat(col(keyCol).cast("string"), lit(":epoch")))
      < fracCol).cast("long")
    // a NULL stratum matches no CASE branch and so falls to the
    // unbudgeted default (exactly one epoch) — the pass-through contract,
    // consistent with tokenBudgetSample's defaultRate treatment of
    // unmatched rows (dropping them would silently delete documents from
    // the training manifest)
    df.withColumn("__n_epochs", fullCol + extra)
      .filter(col("__n_epochs") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n_epochs"))))
      .drop("__n_epochs")
  }
}
