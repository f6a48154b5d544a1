package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, MultimodalQueries, PipelineQueries, SimilarityQueries, TextQueries}

/** The shared (session, dir)-keyed persisted intermediates — jaccard /
  * minhash candidate pairs (DedupQueries), IVF inverted files
  * (SimilarityQueries), and aHash fingerprint tables (MultimodalQueries) —
  * must all be released by the clearCaches() hooks
  * that Bench/Verify call at teardown, or a long-lived session accumulates
  * storage per key. Asserted against the session's persistent-RDD registry
  * relative to a baseline (the shared test session may hold unrelated
  * persists from other suites).
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clearCaches releases every query-cache persist") {
    // start from a clean slate for OUR caches (idempotent if already clean)
    DedupQueries.clearCaches()
    SimilarityQueries.clearCaches()
    MultimodalQueries.clearCaches()
    PipelineQueries.clearCaches()
    TextQueries.clearCaches()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet

    // populate the caches: jaccard pairs (0.8 + 0.6), minhash pairs,
    // IVF index, aHash fingerprints, repeat + contamination intervals,
    // ingest corpus signatures
    DedupQueries.queries("dedup_ngram_jaccard")(spark, TestSpark.sfDir).count()
    DedupQueries.queries("dedup_minhash_recall")(spark, TestSpark.sfDir).count()
    DedupQueries.queries("dedup_substring")(spark, TestSpark.sfDir).count()
    DedupQueries.queries("dedup_ingest_neardup")(spark, TestSpark.sfDir).count()
    SimilarityQueries.queries("ann_ivf_topk")(spark, TestSpark.sfDir).count()
    SimilarityQueries.queries("corpus_topic_report")(spark, TestSpark.sfDir).count()
    MultimodalQueries.queries("multimodal_ahash_pairs")(spark, TestSpark.sfDir).count()
    PipelineQueries.queries("decontaminate_spans")(spark, TestSpark.sfDir).count()
    TextQueries.queries("perplexity_buckets")(spark, TestSpark.sfDir).count()
    val populated = spark.sparkContext.getPersistentRDDs.keySet
    assert((populated -- baseline).nonEmpty,
      "expected the query caches to register persisted RDDs")

    DedupQueries.clearCaches()
    SimilarityQueries.clearCaches()
    MultimodalQueries.clearCaches()
    PipelineQueries.clearCaches()
    TextQueries.clearCaches()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- baseline).isEmpty,
      s"persists leaked past clearCaches(): ${(after -- baseline).toSeq.sorted}")
  }

  test("drainLeaked names and force-releases an unregistered persist") {
    // r18's driver bench recorded leaked_persists:1 with no way to say
    // WHICH RDD leaked (and the leak outlived teardown). The drain must
    // return a descriptor carrying the RDD's name and actually unpersist
    // it. Quiesce the replay fan-out first (its daemon bodies fill caches
    // concurrently — the ServeAllSpec discipline) and scope the asserts
    // to the PLANTED id: the shared session may re-grow unrelated
    // persists at any time, so absolute-empty is not assertable here.
    graft.queries.ReplayOrchestrator.awaitQuiesce(spark, TestSpark.sfDir,
      scala.concurrent.duration.Duration(10, "min"))
    val planted = spark.sparkContext.parallelize(1 to 10, 2)
    planted.setName("planted-unregistered-persist")
    planted.persist().count()
    assert(spark.sparkContext.getPersistentRDDs.contains(planted.id))
    val drained = Bench.drainLeaked(spark)
    assert(drained.exists(d => d.contains("planted-unregistered-persist") &&
      d.contains(s"id=${planted.id}")),
      s"planted leak not named in: $drained")
    assert(!spark.sparkContext.getPersistentRDDs.contains(planted.id),
      "drainLeaked must force-unpersist the leak, not just report it")
    // a second drain no longer reports the planted leak
    assert(!Bench.drainLeaked(spark).exists(_.contains(
      "planted-unregistered-persist")))
  }

  test("clearCaches is idempotent and caches rebuild after a clear") {
    DedupQueries.clearCaches()
    DedupQueries.clearCaches() // second call must not throw
    val df = DedupQueries.queries("dedup_ngram_jaccard")(spark, TestSpark.sfDir)
    assert(df.count() > 0, "cache must repopulate after clearCaches()")
    DedupQueries.clearCaches()
    SimilarityQueries.clearCaches()
  }
}
