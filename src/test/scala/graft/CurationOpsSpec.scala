package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level semantics of the r11 curation additions: exact discrete
  * quantile bucketing (the CCNet-style perplexity partition), the
  * leakage-safe cluster-aware split, and the snapshot drift report.
  * (Cross-engine value equality is the driver's DuckDB gate; these pin
  * the invariants the oracle can't express.) */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quantileBuckets splits distinct scores into exact equal thirds") {
    import spark.implicits._
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val got = graft.operators.TextAnalysis
      .quantileBuckets(df, "id", "s", Seq("tail", "middle", "head"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1 to 3).forall(i => got(i) == "tail"), got)
    assert((4 to 6).forall(i => got(i) == "middle"), got)
    assert((7 to 9).forall(i => got(i) == "head"), got)
  }

  test("quantileBuckets keeps a tie group wholly on one side of a cut") {
    import spark.implicits._
    // 6 rows at score 1.0, 3 at 2.0: cut1 = cut2 = 1.0 (its cumulative
    // count 6 reaches both ceil(9/3)=3 and ceil(18/3)=6), so the whole
    // tie group is 'tail', 'middle' is empty and 2.0 is 'head'
    val df = (Seq.fill(6)(1.0) ++ Seq.fill(3)(2.0)).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val byBucket = graft.operators.TextAnalysis
      .quantileBuckets(df, "id", "s", Seq("tail", "middle", "head"))
      .groupBy("bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBucket == Map("tail" -> 6L, "head" -> 3L), byBucket)
  }

  test("perplexity_buckets: buckets are score-contiguous and cover all scored docs") {
    val rows = graft.queries.TextQueries
      .queries("perplexity_buckets")(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getString(2))
      .map { case (b, rs) => b -> rs.map(_.getDouble(1)) }
    def maxOf(b: String) = byBucket.get(b).map(_.max)
    def minOf(b: String) = byBucket.get(b).map(_.min)
    for (lo <- maxOf("tail"); hi <- minOf("middle")) assert(lo < hi)
    for (lo <- maxOf("middle"); hi <- minOf("head")) assert(lo < hi)
    for (lo <- maxOf("tail"); hi <- minOf("head")) assert(lo < hi)
    // same doc set as the scored LM table
    val scored = graft.queries.TextQueries
      .queries("lm_bigram_quality")(spark, TestSpark.sfDir).count()
    assert(rows.length.toLong == scored)
  }

  test("split_leakage_safe: one split per cluster; reps are never repaired") {
    val out = graft.queries.DedupQueries
      .queries("split_leakage_safe")(spark, TestSpark.sfDir)
    val forked = out.groupBy("cluster_rep")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(forked == 0, "a cluster straddles a split boundary")
    // the rep's own naive split IS the cluster split by construction
    val repRepaired = out.filter(col("doc_id") === col("cluster_rep"))
      .filter(col("leak_repaired")).count()
    assert(repRepaired == 0)
    // covers the whole corpus, one row per doc
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").count()
    assert(out.count() == docs)
  }

  test("groupedQuantiles reads off exact discrete quantiles per group") {
    import spark.implicits._
    // g1: 1..10 once each -> p25=ceil(2.5)th=3, p50=5, p75=ceil(7.5)th=8,
    // p95=ceil(9.5)th=10; g2: five 7s -> every quantile 7
    val df = ((1 to 10).map(v => ("g1", v.toLong)) ++
      Seq.fill(5)(("g2", 7L))).toDF("g", "v")
    val got = graft.operators.TextAnalysis.groupedQuantiles(df, "g", "v",
        Seq(("p25", 25, 100), ("p50", 50, 100), ("p75", 75, 100),
          ("p95", 95, 100)))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("g1", 10L, 3L, 5L, 8L, 10L),
      ("g2", 5L, 7L, 7L, 7L, 7L)), got.toSeq)
  }

  test("groupedQuantiles equals the sorted-index definition on randomized groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val qs = Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10), ("p100", 1, 1))
    for (_ <- 1 to 5) {
      val groups = (1 to (1 + rnd.nextInt(4))).map(g => s"g$g")
      val data = groups.flatMap { g =>
        // heavy ties on purpose: values from a small codomain
        Seq.fill(1 + rnd.nextInt(60))((g, (1 + rnd.nextInt(9)).toLong))
      }
      val got = graft.operators.TextAnalysis
        .groupedQuantiles(data.toDF("g", "v"), "g", "v", qs)
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        def q(num: Int, den: Int): Long =
          sorted(((num.toLong * sorted.size + den - 1) / den - 1).toInt)
        val want = (q(1, 10), q(1, 2), q(9, 10), q(1, 1))
        assert(got(g) == want, s"group $g: ${got(g)} != $want over $sorted")
      }
    }
  }

  test("waterfillAllocation matches a hand-computed fill with spillover") {
    import spark.implicits._
    // capacities a:100, b:1000, c:10000; weights a:4, b:2, c:1 (W=7),
    // budget 3000. Ratios n/w: a=25, b=500, c=10000.
    //  a: 100*7 <= 3000*4            -> saturated, alloc 100
    //  b: 1000*(7-4) <= (3000-100)*2 -> 3000 <= 5800 -> saturated, 1000
    //  c: 10000*1 <= 1900*1          -> unsaturated; λ = 1900/1,
    //     alloc 1900, rate 0.19. Total = 100+1000+1900 = budget. 'x' has
    //     no weight -> rate 0.
    val rows = Seq.tabulate(100)(i => (s"a$i", "a", 1L)) ++
      Seq.tabulate(100)(i => (s"b$i", "b", 10L)) ++
      Seq.tabulate(100)(i => (s"c$i", "c", 100L)) ++
      Seq.tabulate(10)(i => (s"x$i", "x", 5L))
    val df = rows.toDF("id", "dom", "toks")
    val got = graft.operators.Sampling.waterfillAllocation(df, "dom", "toks",
        Map("a" -> 4L, "b" -> 2L, "c" -> 1L), budget = 3000L)
      .orderBy("dom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("a", 100L, 4L, true, 1.0, 100.0),
      ("b", 1000L, 2L, true, 1.0, 1000.0),
      ("c", 10000L, 1L, false, 0.19, 1900.0),
      ("x", 50L, 0L, false, 0.0, 0.0)), got.toSeq)
  }

  test("waterfillAllocation: budget above total capacity saturates everything") {
    import spark.implicits._
    val df = Seq(("1", "a", 10L), ("2", "b", 20L)).toDF("id", "dom", "toks")
    val got = graft.operators.Sampling.waterfillAllocation(df, "dom", "toks",
        Map("a" -> 1L, "b" -> 1L), budget = 1000L)
      .orderBy("dom").collect()
    assert(got.forall(_.getBoolean(3)), "all strata must saturate")
    assert(got.map(_.getDouble(5)).sum == 30.0, "allocation must equal capacity")
  }

  test("quantileBuckets: exact bucket sizes on randomized distinct scores") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val n = 5 + rnd.nextInt(40)
      val k = 2 + rnd.nextInt(3)
      val labels = (1 to k).map(j => s"b$j")
      // distinct scores: a random strictly-increasing walk
      var acc = 0.0
      val scores = (1 to n).map { i => acc += 0.01 + rnd.nextDouble(); (i.toLong, acc) }
      val sizes = graft.operators.TextAnalysis
        .quantileBuckets(scores.toDF("id", "s"), "id", "s", labels)
        .groupBy("bucket").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
      val expected = (1 to k).map(j =>
        labels(j - 1) -> (ceilDiv(j.toLong * n, k) - ceilDiv((j - 1).toLong * n, k)))
        .filter(_._2 > 0).toMap
      assert(sizes == expected, s"n=$n k=$k: $sizes != $expected")
    }
  }

  test("waterfillAllocation invariants hold on randomized strata") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (caseNo <- 1 to 8) {
      val nStrata = 1 + rnd.nextInt(6)
      val strata = (1 to nStrata).map(i => s"s$i")
      val caps = strata.map(_ -> (1L + rnd.nextInt(10000))).toMap
      val weights = strata.map(_ -> rnd.nextInt(6).toLong).toMap
      val rows = strata.flatMap { s =>
        // split each stratum's capacity over a few docs
        var left = caps(s); val out = Seq.newBuilder[(String, String, Long)]
        var i = 0
        while (left > 0) {
          val t = math.min(left, 1 + rnd.nextInt(500).toLong)
          out += ((s"$s-$i", s, t)); left -= t; i += 1
        }
        out.result()
      }
      val activeTotal = strata.filter(weights(_) > 0).map(caps).sum
      val budget = rnd.nextInt(2 * math.max(1, activeTotal).toInt).toLong
      val df = rows.toDF("id", "dom", "toks")
      def run(b: Long) = graft.operators.Sampling
        .waterfillAllocation(df, "dom", "toks", weights, b)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4),
            r.getDouble(5))).toMap
      val got = run(budget)
      got.foreach { case (s, (n, w, sat, rate, alloc)) =>
        assert(n == caps(s) && w == weights(s), s"case $caseNo $s: wrong table row")
        assert(rate >= 0.0 && rate <= 1.0, s"case $caseNo $s: rate $rate")
        assert(!(w == 0) || (rate == 0.0 && alloc == 0.0 && !sat),
          s"case $caseNo $s: weightless stratum must sit out")
        assert(!sat || (rate == 1.0 && alloc == n.toDouble),
          s"case $caseNo $s: saturated must take full capacity")
      }
      val allocSum = got.values.map(_._5).sum
      val expect = math.min(budget, activeTotal).toDouble
      assert(math.abs(allocSum - expect) <= 1e-3,
        s"case $caseNo: allocations sum to $allocSum, budget law says $expect")
      // monotonicity: more budget never shrinks any stratum's allocation
      val more = run(budget + 1 + rnd.nextInt(1000))
      got.foreach { case (s, (_, _, _, _, alloc)) =>
        assert(more(s)._5 >= alloc - 1e-6,
          s"case $caseNo $s: allocation shrank when the budget grew")
      }
    }
  }

  test("curriculumOrder equals the single-window formulation and separates phases") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.queries.TextQueries
      .queries("curriculum_order")(spark, TestSpark.sfDir)
    // two-level prefix scan == one global row_number over
    // (phase, order_key, doc_id)
    val oneWindow = out.withColumn("ref_pos",
      row_number().over(Window.orderBy("phase", "order_key", "doc_id"))
        .cast("long") - 1)
    assert(oneWindow.filter(col("pos") =!= col("ref_pos")).count() == 0,
      "two-level positions diverge from the single-window truth")
    // positions are a permutation of 0..n-1 and phases occupy disjoint
    // contiguous position ranges in phase order
    val n = out.count()
    assert(out.select("pos").distinct().count() == n)
    assert(out.agg(min("pos"), max("pos")).collect().head match {
      case r => r.getLong(0) == 0L && r.getLong(1) == n - 1
    })
    val ranges = out.groupBy("phase")
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("cnt"))
      .orderBy("phase").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ranges.foreach { case (_, lo, hi, cnt) => assert(hi - lo + 1 == cnt,
      s"phase range not contiguous: $ranges") }
    ranges.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(hi1 < lo2, s"phases interleave: $ranges")
      case _ => ()
    }
  }

  test("corpus_materialize_curriculum: packed stream is phase-ordered and accounts every token") {
    val rows = graft.queries.TextQueries
      .queries("corpus_materialize_curriculum")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(3), r.getInt(2), r.getLong(4), r.getLong(5),
        r.getLong(6))) // (pos, phase, n_tokens, seq_id, seq_offset)
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // positions dense from 0; phases and seq_ids non-decreasing in pos
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._2 <= b._2 && a._4 <= b._4
      case _ => true
    }, "phase or seq_id decreases along the packed stream")
    // each doc starts exactly where the previous stream position left off
    var cum = 0L
    rows.foreach { case (_, _, n, seqId, seqOff) =>
      assert(seqId == cum / 512 && seqOff == cum % 512,
        s"placement mismatch at cum=$cum")
      cum += n
    }
  }

  test("corpus_materialize_full agrees with its component stages on every document") {
    import graft.queries.{PipelineQueries, TextQueries}
    val dir = TestSpark.sfDir
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val kept = TextQueries.queries("corpus_materialize_full")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap // doc_id -> phase
    assert(kept.nonEmpty)
    // stage verdicts from the STANDALONE stage operators/queries
    val keepers = graft.operators.Dedup.exact(corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val blockKeep = TextQueries.queries("blocklist_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val contaminated = PipelineQueries.queries("decontaminate_ngram")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val nTok = corpus.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every materialized doc passed EVERY gate its standalone query reports
    kept.keys.foreach { id =>
      assert(id % 5 != 0, s"eval-slice doc $id materialized")
      assert(keepers(id), s"non-keeper duplicate $id materialized")
      assert(blockKeep(id), s"blocklisted doc $id materialized")
      assert(!contaminated(id), s"contaminated doc $id materialized")
      assert(nTok(id) >= 20, s"under-length doc $id materialized")
    }
    // docs absent from the output either failed a gate or lost the
    // md5-rate mixture draw — never a fifth, unreported reason
    val gatePassers = nTok.keySet.filter(id => keepers(id) && blockKeep(id)
      && !contaminated(id) && nTok(id) >= 20)
    assert(kept.keySet.subsetOf(gatePassers))
    // the fixture must exercise every splice point (r14's two new stages
    // included), or this test proves nothing about them
    assert(contaminated.nonEmpty, "fixture has no contaminated corpus doc")
    assert(nTok.keySet.exists(id => !blockKeep.getOrElse(id, true)),
      "fixture has no blocklisted corpus doc")
    // at this spec SF the fixture plants no exact duplicate INSIDE the
    // %5!=0 training slice, so the dedup gate is vacuous here (every
    // slice doc is its own keeper) — pin that understanding; the operator
    // itself is gated by the dedup_exact driver row and DedupScaleSpec
    assert(nTok.keySet.forall(keepers),
      "slice dedup unexpectedly active — strengthen the stage assertions")
    assert(gatePassers.size > kept.size,
      "mixture stage sampled nothing (budget not binding)")
    // phases agree with the corpus-level perplexity terciles
    val buckets = TextQueries.queries("perplexity_buckets")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        Map("tail" -> 0, "middle" -> 1, "head" -> 2)(r.getString(2))).toMap
    kept.foreach { case (id, phase) =>
      assert(phase == buckets.getOrElse(id, 0), s"phase mismatch for $id")
    }
  }

  test("corpus_drift_report: exact stats stay in range over all features") {
    val rows = graft.queries.TextQueries
      .queries("corpus_drift_report")(spark, TestSpark.sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted ==
      Seq("lang", "len_bucket", "source"))
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").count()
    rows.foreach { r =>
      val (nRef, nNew) = (r.getLong(2), r.getLong(3))
      val (tv, mg) = (r.getDouble(4), r.getDouble(5))
      assert(nRef + nNew == docs, s"slices must partition the corpus: $r")
      assert(tv >= 0.0 && tv <= 1.0, s"tv_dist out of range: $r")
      assert(mg >= 0.0 && mg <= 1.0, s"max_gap out of range: $r")
      // the largest single gap can't exceed the sum of all gaps (= 2*tv)
      assert(mg <= 2 * tv + 1e-9, s"max_gap exceeds total shift: $r")
    }
  }

  test("funnel report agrees with its component stages on every document") {
    import graft.queries.TextQueries
    val funnel = TextQueries.queries("corpus_funnel_report")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val quality = TextQueries.queries("corpus_quality_filter")(spark, TestSpark.sfDir)
      .select("doc_id", "keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val block = TextQueries.queries("blocklist_filter")(spark, TestSpark.sfDir)
      .select("doc_id", "keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(funnel.size === quality.size)
    funnel.foreach { case (id, stage) =>
      stage match {
        case "kept" => assert(block(id) && quality(id), s"doc $id kept wrongly")
        case "blocklist" => assert(!block(id), s"doc $id not actually blocked")
        case "quality" =>
          assert(block(id) && !quality(id), s"doc $id mis-staged as quality")
        case "duplicate" => // min-id dup semantics pinned by the sf0.1 oracle
        case other => fail(s"unknown stage $other")
      }
    }
    // the fixture must exercise a mixed funnel, not a single stage
    assert(Set("kept", "quality", "blocklist").subsetOf(funnel.values.toSet),
      s"fixture degenerate: stages ${funnel.values.toSet}")
  }

  test("blocklist filter: token boundary exactness, multiplicity, phrase substring") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean words only"),          // no hit -> keep
      (2L, "zap then zap again"),        // blocked token twice
      (3L, "a bad phrase lives here"),   // blocked phrase as substring
      (4L, "zapx is not the token zapy"),// substring != word-boundary token
      (5L, "phrase bad in reverse"))     // phrase words present, order wrong
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.blocklistSignals(
        docs, "doc_id", "text",
        blockedTokens = Seq("zap"), blockedPhrases = Seq("bad phrase"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, true),
      (2L, 2L, 0L, false),
      (3L, 0L, 1L, false),
      (4L, 0L, 0L, true),
      (5L, 0L, 0L, true)))
    // a capitalized blocklist file must fire against lowercased text —
    // the lists are normalized, not compared verbatim
    val cased = graft.operators.TextAnalysis.blocklistSignals(
        docs, "doc_id", "text",
        blockedTokens = Seq("ZAP"), blockedPhrases = Seq("Bad Phrase"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(cased.toSeq.map(_._2) === Seq(true, false, false, true, true))
  }
}
