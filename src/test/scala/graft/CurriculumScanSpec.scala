package graft

import org.scalatest.funsuite.AnyFunSuite

/** Records-read budget for the curriculum capstone chain — the
  * records-read technique of InvertedIndexSpec/ZOrderSpec applied to the
  * round's plan-reuse wins: `corpus_materialize_curriculum` composes
  * exact-dedup, the length gate, the waterfill mixture, the TRIGRAM-LM
  * perplexity phases, the curriculum position scan, and sequence packing
  * into one DAG whose only expensive leaves are scans of the documents
  * parquet. The trigram phase table and the bucket table are persisted
  * (session, dir)-keyed intermediates; LOSING either cache re-runs the
  * whole multi-scan LM derivation per consumer — the budget below is
  * tight enough that a single lost cache (~20x n extra records) turns
  * this red, while cold-start legitimate reads fit comfortably. */
class CurriculumScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("curriculum capstone fits a records-read budget cold AND nearly free warm") {
    // cold start: drop the shared LM/bucket caches so the budget is
    // deterministic regardless of suite ordering
    graft.queries.TextQueries.clearCaches()
    val n = Tables.load(spark, TestSpark.sfDir, "documents").count()
    def measure(body: => Unit): Long = {
      val read = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        org.apache.spark.sql.graft.bridge.waitListenerBus(spark)
      } finally spark.sparkContext.removeSparkListener(listener)
      read.get()
    }
    def run(): Unit = graft.queries.TextQueries
      .queries("corpus_materialize_curriculum")(spark, TestSpark.sfDir).collect()
    val cold = measure(run())
    val warm = measure(run())
    info(s"curriculum capstone records read: cold=$cold warm=$warm (n=$n)")
    // cold pays the one-time LM + bucket materialization (the trigram
    // score execution scans documents for each of its model-table leaves)
    // plus the chain's own scans; a lost cache re-pays the LM derivation
    // per consumer and blows this budget
    assert(cold <= 25 * n,
      s"cold curriculum run read $cold records (> ${25 * n}) — a shared " +
        "cache was lost or a stage re-scans the corpus")
    // warm: the score/bucket tables are cached, only the chain's own
    // per-run scans remain
    assert(warm <= 10 * n,
      s"warm curriculum run read $warm records (> ${10 * n}) — persisted " +
        "intermediates are not being reused")
    assert(warm < cold, "warm run should read strictly less than cold")
  }
}
