package graft

import org.scalatest.funsuite.AnyFunSuite

/** Records-read budget for the multi-benchmark decontamination sweep —
  * the CurriculumScanSpec technique guarding `decontaminate_multi`'s
  * "ONE corpus scan per kind" contract: N benchmarks union into ONE
  * tagged side per kind (one bloom + one shingle equi-join for the
  * lexical kind, one broadcast cosine pass for the embedding kind), so
  * the records read must NOT scale with the benchmark count. The budget
  * is set so a per-benchmark corpus rescan (4 benchmarks → ~2x the
  * document + embedding reads) turns this red, while the legitimate
  * reads (corpus shingles + eval shingles + the bloom-build aggregate;
  * corpus vectors + eval vectors) fit comfortably. */
class DecontaminationScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def measure(body: => Unit): Long = {
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

  test("multi-benchmark sweep reads the corpus once per kind, not once per benchmark") {
    val dir = TestSpark.sfDir
    val nDocs = Tables.load(spark, dir, "documents").count()
    val nVecs = Tables.load(spark, dir, "embeddings").count()
    val read = measure {
      graft.queries.PipelineQueries
        .queries("decontaminate_multi")(spark, dir).collect()
    }
    info(s"decontaminate_multi records read: $read (docs=$nDocs, vecs=$nVecs)")
    // measured: ~2.5x(n+m) at sf0.001 — the corpus-slice shingle scan,
    // the eval-slice shingle + bloom-build scans, the vector scans, and
    // Spark's exchange-side re-reads. The budget below holds that level
    // with moderate headroom while a per-benchmark corpus rescan (the 4
    // benchmarks each re-reading documents/embeddings ≈ +3x(n+m)) blows
    // straight through it.
    assert(read <= (3.5 * nDocs + 3.5 * nVecs).toLong,
      s"sweep read $read records (docs=$nDocs, vecs=$nVecs) — a kind is " +
        "rescanning the corpus per benchmark")
  }
}
