package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, IvfPq, PqIndex}
import graft.queries.SimilarityQueries

/** Composed IVF+PQ serving path: candidate containment (it can only score
  * what the probes admit), full-probe+full-candidate degeneration to brute
  * force, and shortlist recall at the query operating point. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
  private lazy val ivf = IvfIndex.build(emb, "vec_id", "embedding", nCells = 8)
  private lazy val pq = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 256)
  private lazy val index = new IvfPq(ivf, pq)
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

  test("results are contained in the probed cells") {
    val got = index.topK(queries, k = 5, nprobe = 3, nCandidates = 64)
      .select("q_id", "c_id")
    val admitted = ivf.probes(queries, nprobe = 3).select("q_id", "cell")
      .join(ivf.cells.select("cell", "c_id"), "cell")
      .select("q_id", "c_id")
    assert(got.except(admitted).count() === 0L)
  }

  test("full probe + corpus-wide shortlist degenerates to brute force") {
    // compare (q_id, c_id) membership, not ranks: the brute-force query
    // ranks 6-dp-rounded cosines while IvfPq ranks unrounded ones, so a
    // tie at 6 decimals may legitimately order differently
    val n = emb.count().toInt
    val got = index.topK(queries, k = 5, nprobe = 8, nCandidates = n + 1)
      .select("q_id", "c_id")
    val exact = SimilarityQueries.queries("ann_bruteforce_topk")(spark, TestSpark.sfDir)
      .select("q_id", "c_id")
    assert(got.except(exact).count() === 0L)
    assert(exact.except(got).count() === 0L)
  }

  test("composition of DURABLE indexes equals the in-session composition") {
    // IvfPq is representation-agnostic: wiring the file-backed IVF and
    // the file-backed PQ into the same operator must reproduce the
    // in-session pair exactly (both durable halves are already pinned to
    // their in-session twins individually; this closes the matrix)
    val ivfPath = "target/ivfpq-durable-test/ivf"
    val pqPath = "target/ivfpq-durable-test/pq"
    ivf.write(ivfPath, source = "compose")
    pq.write(pqPath, source = "compose")
    val durable = new IvfPq(
      IvfIndex.load(spark, ivfPath), PqIndex.load(spark, pqPath))
    val a = index.topK(queries, k = 5, nprobe = 6, nCandidates = 64)
      .select("q_id", "c_id", "rank")
    val b = durable.topK(queries, k = 5, nprobe = 6, nCandidates = 64)
      .select("q_id", "c_id", "rank")
    assert(a.except(b).count() === 0L)
    assert(b.except(a).count() === 0L)
  }

  test("full recall@5 at the driver operating point (nprobe=6, C=256)") {
    val got = index.topK(queries, k = 5, nprobe = 6, nCandidates = 256)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = SimilarityQueries.queries("ann_bruteforce_topk")(spark, TestSpark.sfDir)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.foreach { case (qid, ex) =>
      val gotSet = got.getOrElse(qid, Set.empty)
      val recall = ex.intersect(gotSet).size.toDouble / ex.size
      assert(recall === 1.0, s"q $qid recall $recall (pq=$gotSet exact=$ex)")
    }
  }
}
