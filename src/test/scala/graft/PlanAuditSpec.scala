package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-hygiene audit over the ENTIRE driver query surface: no query may
  * plan an unbounded cartesian product, and broadcast-nested-loop joins
  * are allowed only where a side is bounded by construction (documented
  * allowlist). A regression that sneaks an all-pairs join into any of the
  * 58 queries fails here, not at 100 TB. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries whose plan legitimately contains a broadcast-nested-loop
    * join over a side that is bounded by construction:
    *  - ann_bruteforce_topk: the <=5-row query set is broadcast
    *  - ann_lsh_recall: its exact baseline side is the same <=5-row
    *    broadcast scan as ann_bruteforce_topk
    *  - ann_ivf_topk: the 8-row centroid table is broadcast
    *  - ann_ivf_persisted: same 8-row centroid broadcast, on both the
    *    in-session and the file-backed probe side
    *  - ann_quantized_topk: the same <=5-row query-set broadcast scan as
    *    ann_bruteforce_topk, over the dequantized vectors
    *  - ann_pq_topk / ann_pq_recall: the <=5-row per-query ADC lookup
    *    tables are broadcast against the code scan (and the recall gate's
    *    exact side is the usual <=5-row broadcast scan)
    *  - term_stats: the 1-row corpus-count aggregate is broadcast
    *  - lm_bigram_quality: the 1-row vocabulary-size aggregate is
    *    broadcast */
  private val boundedBroadcastNL =
    Set("ann_bruteforce_topk", "ann_lsh_recall", "ann_ivf_recall",
      "ann_ivf_topk", "ann_ivf_persisted", "ann_quantized_topk",
      "ann_filtered_topk", "ann_ivf_filtered_recall", "ann_ivfpq_filtered_recall",
      "ann_lsh_filtered_recall", "ann_hard_negatives",
      "ann_pq_topk", "ann_pq_recall", "ann_pq_persisted",
      "ann_ivfpq_topk", "ann_ivfpq_recall", "ann_ivfpq_persisted",
      // the same 8-row centroid broadcast as ann_ivf_persisted, on both
      // the appended-file and the frozen-centroid in-session probe side
      "ann_ivf_appended",
      // same 8-row centroid broadcast on the tombstoned-file / survivors-
      // in-session parity pair (r17 excision gate)
      "ann_ivf_excised",
      // same 8-row centroid broadcast; the refreshed quantizer's full
      // probe vs the <=5-row exact-side broadcast scan (r17 refit gate)
      "ann_ivf_drift_refit",
      "ann_pq_drift_refit",
      // the <=5-row per-query ADC lookup-table broadcast of ann_pq_topk,
      // on both the appended-file and encode-fresh in-session side (r17)
      "ann_pq_appended",
      // same LUT broadcast on the tombstoned-file / survivors-encode
      // parity pair (r17 excision gate)
      "ann_pq_excised",
      // the 8-row frozen-centroid broadcast on both the folded-index and
      // assign-everything parity sides (r17 streaming fold gate)
      "streaming_index_fold_replay",
      // the same <=5-row query-set broadcast as ann_bruteforce_topk, over
      // the 16-dim prefix columns (the coarse pass of the MRL re-ranker)
      "ann_matryoshka_topk",
      // the bounded EVAL-set broadcast (benchmarks are thousands of rows
      // however large the corpus); the corpus side streams through one scan
      "decontaminate_semantic",
      // same bounded eval-vector broadcast, tagged by benchmark — the
      // multi-benchmark sweep's one cosine pass
      "decontaminate_multi",
      "term_stats", "lm_bigram_quality", "bm25_rank",
      // |L|-row class-prior table broadcast into the per-doc scorer
      "classifier_train_score", "classifier_persisted", "corpus_filter_classifier",
      // the same |L|-row class-prior broadcast, served from the
      // excised durable model (r20 unlearning gate)
      "classifier_excised",
      // the same |L|-row class-prior broadcast, char-trigram features
      "lang_id_trained",
      // exact side of the semantic-recall gate: full-corpus broadcast by
      // design (the verification baseline, not the scale path)
      "dedup_semantic_recall",
      // 1-row corpus-total scalar crossed into the per-domain rate table
      // (the term_stats N-docs pattern)
      "domain_share_cap",
      // 1-row ref/new totals crossed into the |K|-cell count table
      "topic_drift_report",
      // two 1-row sketch aggregates crossed for the array-expression
      // merge (the sketch rows are O(k) however large the corpus)
      "kmv_user_overlap",
      // four 1-row per-half-round max aggregates crossed in as broadcast
      // normalization divisors (Hits.normalize — keeping the rounds lazy
      // is what lets the whole run execute as one job)
      "graph_hits",
      // lm_bigram_quality's 1-row vocabulary broadcast, plus the 1-row
      // corpus-count and 1-row tercile-cut broadcasts of quantileBuckets
      // (curriculum_order and the materialize capstone consume the same
      // LM-score subtree)
      "perplexity_buckets", "curriculum_order",
      "corpus_materialize_curriculum",
      // same LM-score subtree broadcasts as the curriculum capstone
      "corpus_materialize_full",
      // the bounded query-term set broadcast against the vocab-sized df
      // sidecar (levenshtein is a non-equi condition by nature; the
      // length pre-filter guards the kernel)
      "retrieval_fuzzy_correct", "retrieval_fuzzy_serve")

  test("no driver query plans a cartesian product; BNLJ only on bounded sides") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      (if (cart) Seq(s"$name: CartesianProduct") else Nil) ++
        (if (bnlj && !boundedBroadcastNL(name)) Seq(s"$name: unexpected BNLJ") else Nil)
    }
    assert(failures.isEmpty, s"scale-hostile joins found:\n${failures.mkString("\n")}")
  }
}
