package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch.kmv_sketch
import graft.operators.{Packing, Sampling}

/** Pipeline-assembly tier: KMV distinct sketch (merge correctness + error
  * bound + exact small-cardinality path), two-level sequence packing
  * (partition-layout invariance + window-formulation equivalence), and
  * deterministic stratified sampling (nesting + reproducibility). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashed(n: Int) =
    spark.range(n).select(md5(concat(lit("v"), (col("id") % 1000).cast("string"))).as("h"))

  test("kmv sketch is exact below k and bounded-error above k") {
    // 1000 distinct values, k=64 -> estimation path; bound 4/sqrt(k-2)
    val est = hashed(5000).agg(kmv_sketch(col("h"), 64).as("s"))
      .select(col("s.n_kept"), col("s.est_distinct")).head()
    assert(est.getInt(0) === 64)
    val rel = math.abs(est.getDouble(1) - 1000.0) / 1000.0
    assert(rel < 4.0 / math.sqrt(62.0), s"KMV relative error $rel out of bound")
    // k above the true cardinality -> exact count, kth = global max hash
    val exact = hashed(5000).agg(kmv_sketch(col("h"), 2048).as("s"))
      .select(col("s.n_kept"), col("s.est_distinct")).head()
    assert(exact.getInt(0) === 1000 && exact.getDouble(1) === 1000.0)
  }

  test("kmv sketch skips null hashes and returns null for an all-null group") {
    val withNulls = spark.range(100)
      .select(when(col("id") % 3 === 0, md5(col("id").cast("string"))).as("h"))
    val s = withNulls.agg(kmv_sketch(col("h"), 16).as("s")).select("s.n_kept").head()
    assert(s.getInt(0) === 16)
    val allNull = spark.range(5).select(lit(null).cast("string").as("h"))
    assert(allNull.agg(kmv_sketch(col("h"), 16)).head().isNullAt(0))
  }

  test("kmv sketch is invariant to partition layout (merge path)") {
    val one = hashed(5000).repartition(1).agg(kmv_sketch(col("h"), 64)).head()
    val many = hashed(5000).repartition(13).agg(kmv_sketch(col("h"), 64)).head()
    assert(one === many)
  }

  test("kmv hashes field is the ascending kept list; array-merge equals " +
      "the sketch of the unioned stream (bottom-k identity)") {
    val a = hashed(3000).filter(col("h") < "8")
    val b = hashed(3000).filter(col("h") >= "4") // overlapping ranges
    def hs(df: org.apache.spark.sql.DataFrame, k: Int): Seq[String] =
      df.agg(kmv_sketch(col("h"), k).as("s")).select("s.hashes")
        .head().getSeq[String](0)
    val ha = hs(a, 64)
    assert(ha == ha.sorted && ha.distinct == ha, "hashes must be ascending distinct")
    // the k smallest of (k smallest of A) ∪ (k smallest of B) ARE the k
    // smallest of A ∪ B — the identity kmv_user_overlap's merge relies
    // on, saturated or not
    val merged = (ha ++ hs(b, 64)).distinct.sorted.take(64)
    assert(merged == hs(a.union(b), 64),
      "array merge of two sketches diverged from the unioned-stream sketch")
  }

  test("two-level packing equals the single-window formulation") {
    val docs = spark.range(0, 500)
      .select(col("id").as("doc_id"), (col("id") % 37 + 1).as("n_tokens"))
    val blocked = Packing.packSequences(docs, "doc_id", "n_tokens", 128, blockSize = 11)
    // blockSize >> n collapses to one block = the serial single-window scan
    val single = Packing.packSequences(docs, "doc_id", "n_tokens", 128, blockSize = 1 << 20)
    assert(blocked.orderBy("doc_id").collect() === single.orderBy("doc_id").collect())
  }

  test("packing places every document inside its window") {
    val docs = spark.range(0, 300)
      .select(col("id").as("doc_id"), (col("id") % 50).as("n_tokens")) // incl. 0-token docs
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", 100, blockSize = 17)
    val bad = packed.filter(col("seq_offset") < 0 || col("seq_offset") >= 100 ||
      col("seq_id") < 0).count()
    assert(bad === 0)
    // token-count conservation: last doc's cum position equals the total
    val total = docs.agg(sum("n_tokens")).head().getLong(0)
    val last = packed.orderBy(desc("doc_id")).select("seq_id", "seq_offset", "n_tokens").head()
    assert(last.getLong(0) * 100 + last.getLong(1) + last.getLong(2) === total)
  }

  test("shuffle positions are a permutation matching the global md5 order") {
    val docs = spark.range(0, 700).select(col("id").as("doc_id"))
    val got = Packing.shuffleAssign(docs, "doc_id", seed = "t", nShards = 4)
      .select("doc_id", "order_key", "pos", "shard").collect()
    // positions are exactly 0..n-1
    assert(got.map(_.getLong(2)).sorted.toSeq == (0L until 700L))
    // and agree with a driver-side sort of the same keys (the
    // single-window formulation the oracle runs)
    val expected = got.map(r => (r.getString(1), r.getLong(0)))
      .sorted.zipWithIndex.map { case ((_, id), i) => id -> i.toLong }.toMap
    got.foreach(r => assert(r.getLong(2) === expected(r.getLong(0))))
    // round-robin deal over the shuffled order: shards balanced to +-1
    val sizes = got.groupBy(_.getInt(3)).view.mapValues(_.length).values.toSeq
    assert(sizes.size === 4 && sizes.max - sizes.min <= 1)
  }

  test("FFD packing keeps docs whole, respects the budget, and is deterministic") {
    val docs = spark.range(0, 500)
      .select(col("id").as("doc_id"), (col("id") % 97 + 3).as("n_tokens"))
    val packed = Packing.packDocumentsFfd(docs, "doc_id", "n_tokens",
      budget = 150, nShards = 4)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // every doc placed exactly once, never split
    assert(rows.length === 500 && rows.map(_._1).distinct.length === 500)
    // no bin exceeds the budget (no doc here is oversized)
    val occ = rows.groupBy(r => (r._3, r._4)).view.mapValues(_.map(_._2).sum)
    assert(occ.values.forall(_ <= 150), s"overfull bins: ${occ.filter(_._2 > 150)}")
    // first-fit invariant: per shard at most ONE bin at or below half
    occ.toSeq.groupBy(_._1._1).foreach { case (shard, bins) =>
      val small = bins.count(_._2 <= 75)
      assert(small <= 1, s"shard $shard has $small bins at <= half occupancy")
    }
    // deterministic under any input partitioning
    val again = Packing.packDocumentsFfd(docs.repartition(7), "doc_id",
      "n_tokens", budget = 150, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(again.toSet === rows.toSet)
  }

  test("FFD packing gives an oversized doc its own forever-singleton bin") {
    import spark.implicits._
    val docs = Seq((1L, 500L), (2L, 40L), (3L, 40L), (4L, 500L))
      .toDF("doc_id", "n_tokens")
    val rows = Packing.packDocumentsFfd(docs, "doc_id", "n_tokens",
      budget = 100, nShards = 1).collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    val binOf = rows.toMap
    // oversized docs 1 and 4 are alone in their bins; 2 and 3 share one
    assert(binOf(1L) !== binOf(4L))
    assert(binOf(2L) === binOf(3L))
    assert(Set(binOf(1L), binOf(4L)).intersect(Set(binOf(2L))).isEmpty)
  }

  test("shuffle accepts any id column name (order_key from the aliased column)") {
    // regression: order_key used to be built from col(idCol) AFTER the
    // select aliased it to doc_id, so any other name threw an
    // unresolved-column AnalysisException
    val named = spark.range(0, 100).select(col("id").as("event_pk"))
    val viaName = Packing.shuffleAssign(named, "event_pk", seed = "t", nShards = 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val canonical = Packing.shuffleAssign(
        spark.range(0, 100).select(col("id").as("doc_id")), "doc_id", "t", 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(viaName == canonical, "column name must not change the permutation")
  }

  test("shuffle is reproducible for a seed and independent across seeds") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"))
    def posMap(seed: String): Map[Long, Long] =
      Packing.shuffleAssign(docs, "doc_id", seed, nShards = 8)
        .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(posMap("a") == posMap("a"))
    val a = posMap("a"); val b = posMap("b")
    assert(a != b, "different seeds must give different permutations")
    // neither permutation is the identity (md5 scrambles)
    assert(a.count { case (id, p) => id == p } < 10)
  }

  test("packing with duplicate ids stays sequential (ROWS frame, no overlap)") {
    val docs = Seq((5L, 10L), (5L, 10L), (6L, 4L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", 8, blockSize = 100)
      .select("seq_id", "seq_offset", "n_tokens").collect()
    // RANGE-frame peers would both land at cum=20 -> identical placement;
    // the ROWS frame places the three docs at offsets 0, 10, 20 of the stream
    val starts = packed.map(r => r.getLong(0) * 8 + r.getLong(1)).sorted
    assert(starts === Array(0L, 10L, 20L))
  }

  test("packing carries pass-through columns without a join-back") {
    val docs = Seq((1L, 3L, "en"), (2L, 4L, "fr")).toDF("doc_id", "n_tokens", "lang")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", 8,
      blockSize = 100, carryCols = Seq("lang"))
    assert(packed.columns.toSeq ===
      Seq("doc_id", "n_tokens", "seq_id", "seq_offset", "spans_boundary", "lang"))
    assert(packed.filter(col("lang") === "fr").head().getLong(3) === 3L)
  }

  test("chunking reconstructs the document and honors size/overlap") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(11)
    val texts = Seq(3, 49, 50, 51, 150, 151, 199, 200, 201, 350, 777).zipWithIndex
      .map { case (n, i) =>
        (i.toLong, Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString)
      }
    val df = texts.toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text", 200, 50)
      .orderBy("doc_id", "chunk_idx").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSeq).toMap
    texts.foreach { case (id, text) =>
      val cs = chunks(id)
      // drop the 50-char overlap from every chunk after the first
      val rebuilt = cs.head + cs.tail.map(_.drop(50)).mkString
      assert(rebuilt === text, s"doc $id not reconstructed")
      assert(cs.forall(_.length <= 200))
      assert(cs.init.forall(_.length == 200), s"doc $id non-final chunk short")
    }
  }

  test("stratified samples nest as the rate grows and are reproducible") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    def ids(rate: Double) =
      Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> rate))
        .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val q = ids(0.25)
    val h = ids(0.5)
    assert(q.subsetOf(h), "rate-0.25 sample must be a subset of rate-0.5")
    assert(ids(0.25) === q, "sampling must be deterministic across runs")
    val enTotal = docs.filter(col("lang") === "en").count().toDouble
    assert(math.abs(h.size / enTotal - 0.5) < 0.15, s"empirical rate ${h.size / enTotal}")
    // default rate keeps everything in unlisted strata
    val zh = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.1))
      .filter(col("lang") === "zh").count()
    assert(zh === docs.filter(col("lang") === "zh").count())
  }

  test("token-budget sample lands near each budget and keeps clamped strata whole") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val totals = docs.groupBy("lang").agg(sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enBudget = totals("en") / 3
    val kept = Sampling.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
      Map("en" -> enBudget, "de" -> (totals("de") * 10)), defaultRate = 0.0)
    val keptTok = kept.groupBy("lang").agg(sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: rate 1/3 — kept token mass within 40% of the budget (the md5
    // membership is deterministic for the fixture, not random per run)
    assert(math.abs(keptTok("en").toDouble / enBudget - 1.0) < 0.4,
      s"en kept ${keptTok("en")} vs budget $enBudget")
    // de: budget above total — clamped rate 1, stratum kept WHOLE
    assert(keptTok("de") === totals("de"))
    // unbudgeted strata at defaultRate 0 are gone entirely
    assert(!keptTok.contains("es") && !keptTok.contains("fr"))
    // nesting: half the budget selects a subset of the full-budget sample
    val ids = kept.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val half = Sampling.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
      Map("en" -> enBudget / 2), defaultRate = 0.0)
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(ids), "samples must nest as the budget grows")
  }

  test("domain doc cap: two-level top-K equals the single-window rank, exactly cap kept") {
    // skewed domains: domain d_k holds (k+1)*40 rows — the head domain is
    // 8x the tail, so the salted local pass actually prunes
    val rows = spark.range(0, 1200)
      .select(col("id").as("key"),
        concat(lit("d"), floor(sqrt(col("id") / 40.0)).cast("int").cast("string")).as("dom"))
    val capped = Sampling.domainDocCap(rows, "key", "dom", cap = 7, nSalts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // oracle: single global window in memory
    val byDom = rows.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2)
    val expected = byDom.toSeq.flatMap { case (dom, ks) =>
      ks.map(_._1).sortBy(k => (md5str(k), k)).take(7)
        .zipWithIndex.map { case (k, i) => (k, dom, i + 1L) }
    }.toSet
    assert(capped.toSet === expected)
    // every domain with >= 7 rows contributes exactly 7
    val kept = capped.groupBy(_._2).map { case (d, xs) => d -> xs.length }
    byDom.foreach { case (d, ks) => assert(kept(d) === math.min(7, ks.length)) }
    // nesting: cap=3's kept set is a subset of cap=7's
    val smaller = Sampling.domainDocCap(rows, "key", "dom", cap = 3, nSalts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(smaller.subsetOf(capped.map(t => (t._1, t._2)).toSet))
  }

  test("domain share cap: over-share domains downsampled, under-share kept whole") {
    // d_big = 300 of 400 rows (75% share), d_a/d_b = 50 each (12.5%)
    val rows = spark.range(0, 400)
      .select(col("id").as("key"),
        when(col("id") < 300, "d_big")
          .when(col("id") < 350, "d_a").otherwise("d_b").as("dom"))
    val capped = Sampling.domainShareCap(rows, "key", "dom", maxShare = 0.25)
      .select("key", "dom").collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = capped.groupBy(_._2).map { case (d, xs) => d -> xs.length }
    // under-share domains survive intact
    assert(kept("d_a") === 50 && kept("d_b") === 50)
    // the head domain lands near rate 0.25*400/300 = 1/3 of its 300 rows
    assert(kept("d_big") > 60 && kept("d_big") < 140,
      s"head domain kept ${kept("d_big")} of 300 at rate 1/3")
    // membership is the deterministic md5 filter — reproducible
    val again = Sampling.domainShareCap(rows, "key", "dom", maxShare = 0.25)
      .select("key", "dom").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(capped.toSet === again.toSet)
  }

  test("domain doc cap survives a single-domain corpus (worst-case skew)") {
    // every row in ONE domain: the salted local pass is the only thing
    // between the sort and a single 2000-row partition
    val rows = spark.range(0, 2000)
      .select(col("id").as("key"), lit("only").as("dom"))
    val capped = Sampling.domainDocCap(rows, "key", "dom", cap = 5, nSalts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val expected = (0L until 2000L).sortBy(k => (md5str(k), k)).take(5)
      .zipWithIndex.map { case (k, i) => (k, i + 1L) }.toSet
    assert(capped.toSet === expected)
  }

  private def md5str(k: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("temperature rebalance flattens the mixture toward rare strata") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureRebalance(docs, "doc_id", "lang",
        tau = 0.5, keepFraction = 0.5)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // overall volume lands near keepFraction (hash noise tolerated)
    val total = before.values.sum.toDouble
    val keptTotal = kept.values.sum.toDouble
    assert(math.abs(keptTotal / total - 0.5) < 0.15,
      s"kept ${keptTotal / total} of the corpus, wanted ~0.5")
    // retention rate of the rarest stratum >= that of the most common
    // (tau < 1 upweights the tail — the whole point of the operator)
    val rare = before.minBy(_._2)._1
    val common = before.maxBy(_._2)._1
    assert(before(rare) < before(common), "fixture mixture unexpectedly flat")
    val rareRetention = kept.getOrElse(rare, 0L).toDouble / before(rare)
    val commonRetention = kept.getOrElse(common, 0L).toDouble / before(common)
    assert(rareRetention > commonRetention,
      s"rare '$rare' retained $rareRetention <= common '$common' $commonRetention")
    // deterministic across invocations
    val again = Sampling.temperatureRebalance(docs, "doc_id", "lang",
        tau = 0.5, keepFraction = 0.5)
      .agg(count(lit(1))).head().getLong(0)
    assert(again === keptTotal.toLong)
  }

  test("epoch upsample: capped, fractional, downsampled, and pass-through strata") {
    // four strata of 10 docs x 10 tokens (supply 100 each):
    //   sat  budget 1000 -> rate 10 capped at 3 (frac 0: EVERY doc 3 epochs)
    //   up   budget  250 -> rate 2.5 (2 full + md5-fraction third)
    //   down budget   50 -> rate 0.5 (degrades to 0-or-1 downsampling)
    //   pass unbudgeted  -> exactly 1 epoch
    val langs = Array("sat", "up", "down", "pass")
    val docs = (0 until 40).map(i => (i.toLong, langs(i % 4), 10L))
      .toDF("doc_id", "lang", "n_tokens")
      // a null-stratum doc rides along: pass-through at exactly 1 epoch
      // (dropping it would delete the doc from the training manifest)
      .unionByName(Seq((99L, Option.empty[String], 10L))
        .toDF("doc_id", "lang", "n_tokens"))
    val out = Sampling.epochUpsample(docs, "doc_id", "lang", "n_tokens",
      Map("sat" -> 1000L, "up" -> 250L, "down" -> 50L), maxEpochs = 3)
    val got = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("epoch").as("mn"), max("epoch").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent reimplementation of the salted md5 fraction (pure JDK,
    // no Spark expression shared with the operator under test)
    def frac(key: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$key:epoch".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) / 1152921504606846976.0
    }
    (0 until 40).foreach { i =>
      val expected = langs(i % 4) match {
        case "sat" => 3L
        case "up" => 2L + (if (frac(i.toLong) < 0.5) 1L else 0L)
        case "down" => if (frac(i.toLong) < 0.5) 1L else 0L
        case _ => 1L
      }
      val (n, mn, mx) = got.getOrElse(i.toLong, (0L, 0L, 0L))
      assert(n === expected, s"doc $i (${langs(i % 4)}): $n epochs, wanted $expected")
      // epochs are the contiguous run 1..n, no gaps, no duplicates
      if (expected > 0) assert(mn === 1L && mx === expected)
    }
    // the fractional stratum actually exercised both outcomes
    val upCounts = (0 until 40).filter(_ % 4 == 1).map(i => got(i.toLong)._1).toSet
    assert(upCounts === Set(2L, 3L),
      s"fixture left the fractional branch one-sided: $upCounts")
    // the null-stratum doc passed through at exactly one epoch
    assert(got.get(99L).map(_._1) === Some(1L), s"null-stratum doc: ${got.get(99L)}")
  }

  test("epoch upsample is monotone in the budget and lands the token mass") {
    val docs = (0 until 200).map(i => (i.toLong, "xx", (i % 7 + 1).toLong))
      .toDF("doc_id", "lang", "n_tokens")
    val supply = (0 until 200).map(i => (i % 7 + 1).toLong).sum
    def multiplicities(budget: Long): Map[Long, Long] =
      Sampling.epochUpsample(docs, "doc_id", "lang", "n_tokens",
          Map("xx" -> budget), maxEpochs = 10)
        .groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budgets = Seq(supply / 2, supply, supply * 2, supply * 7 / 2)
    val runs = budgets.map(multiplicities)
    // a larger budget never takes an epoch away from any document (floor
    // grows stepwise, the md5 threshold grows within each step)
    runs.sliding(2).foreach { case Seq(lo, hi) =>
      (0L until 200L).foreach { id =>
        assert(lo.getOrElse(id, 0L) <= hi.getOrElse(id, 0L),
          s"doc $id lost an epoch when the budget grew")
      }
    }
    // emitted token mass lands on the budget (md5-fraction noise only)
    budgets.zip(runs).foreach { case (b, m) =>
      val mass = (0 until 200)
        .map(i => m.getOrElse(i.toLong, 0L) * (i % 7 + 1)).sum
      assert(math.abs(mass.toDouble - b) / b < 0.15,
        s"budget $b materialized $mass tokens")
    }
  }
}
