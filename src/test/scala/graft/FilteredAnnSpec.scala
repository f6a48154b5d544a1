package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.queries.SimilarityQueries

/** Predicate-filtered ANN (FAISS IDSelector-style): the allowed-id set
  * must restrict the CANDIDATE stream before scoring/ranking, not the
  * ranked result after — post-filtering a top-k under-fills (or empties)
  * whenever the predicate is selective. The planted fixture makes that
  * failure mode visible: every unfiltered top-5 neighbor is disallowed,
  * so a post-filter would return zero rows while the correct filtered
  * top-5 is full.
  */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ids 1-5 hug the query direction (would dominate an unfiltered top-5);
  // ids 6-10 sit farther out on the same side. Only 6-10 are allowed.
  private lazy val fixture = {
    val near = (1 to 5).map(i => (i.toLong, Array(1.0f, i * 0.001f, 0.0f, 0.0f)))
    val far = (6 to 10).map(i => (i.toLong, Array(1.0f, 0.0f, (i - 5) * 0.1f, 0.0f)))
    (near ++ far ++ Seq((99L, Array(0.0f, 0.0f, 0.0f, 1.0f))))
      .toDF("vec_id", "embedding")
  }

  test("filter restricts candidates before ranking, so the top-k stays full") {
    val idx = IvfIndex.build(fixture, "vec_id", "embedding", nCells = 2,
      sampleSize = 64)
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("q_id", "qv")
    val allowed = (6L to 10L).toDF("c_id")
    val got = idx.topKFiltered(q, k = 5, nprobe = 2, allowed)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // all five allowed neighbors surface — a post-filter of the unfiltered
    // top-5 (ids 1-5, all disallowed) would have returned nothing
    assert(got === (6L to 10L).map((0L, _)).toSet)
    idx.close()
  }

  test("full-probe filtered IVF equals the filtered brute force on the fixture dir") {
    val gate = SimilarityQueries.queries("ann_ivf_filtered_recall")(
      spark, TestSpark.sfDir).collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0,
        s"query ${r.getAs[Long]("q_id")}: filtered IVF missed " +
          s"${r.getAs[Long]("n_exact") - r.getAs[Long]("n_hit")} filtered-exact neighbors")
    }
  }

  test("filtered results never contain a disallowed id or the query itself") {
    val top = SimilarityQueries.queries("ann_filtered_topk")(spark, TestSpark.sfDir)
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val odd = emb.filter(col("label") % 2 =!= 0)
      .select("vec_id").as[Long].collect().toSet
    top.select("q_id", "c_id").as[(Long, Long)].collect().foreach { case (q, c) =>
      assert(!odd.contains(c), s"disallowed id $c in filtered top-k of $q")
      assert(q != c)
    }
  }

  test("filtered IVF+PQ shortlist fills from allowed candidates only") {
    import graft.operators.{IvfPq, PqIndex}
    val idx = IvfIndex.build(fixture, "vec_id", "embedding", nCells = 2,
      sampleSize = 64)
    val pq = PqIndex.build(fixture, "vec_id", "embedding", m = 2, ksub = 4)
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("q_id", "qv")
    val allowed = (6L to 10L).toDF("c_id")
    val got = new IvfPq(idx, pq)
      .topKFiltered(q, k = 5, nprobe = 2, nCandidates = 6, allowed)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // nCandidates >= |allowed|: every allowed candidate survives the ADC
    // cut, exact re-rank returns all five despite ids 1-5 dominating the
    // unfiltered ranking
    assert(got === (6L to 10L).map((0L, _)).toSet)
    idx.close(); pq.close()
  }

  test("full-probe filtered IVF+PQ equals the filtered brute force on the fixture dir") {
    val gate = SimilarityQueries.queries("ann_ivfpq_filtered_recall")(
      spark, TestSpark.sfDir).collect()
    assert(gate.nonEmpty)
    gate.foreach(r => assert(r.getAs[Double]("recall") === 1.0))
  }

  test("filtered LSH restricts candidates before bucketing, so the top-k stays full") {
    import graft.operators.AnnLsh
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("q_id", "qv")
    val allowed = (6L to 10L).toDF("c_id")
    val got = AnnLsh.topKFiltered(fixture, "vec_id", "embedding",
        q, "q_id", "qv", k = 5, allowed, probes = 2)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // ids 1-5 dominate the unfiltered ranking; a post-filter would return
    // nothing, the pre-bucket semi join returns all five allowed neighbors
    assert(got === (6L to 10L).map((0L, _)).toSet)
  }

  test("filtered LSH gate equals the filtered brute force on the fixture dir") {
    val gate = SimilarityQueries.queries("ann_lsh_filtered_recall")(
      spark, TestSpark.sfDir).collect()
    assert(gate.nonEmpty)
    gate.foreach(r => assert(r.getAs[Double]("recall") === 1.0,
      s"query ${r.getAs[Long]("q_id")}: filtered LSH missed neighbors"))
  }

  test("a malformed allowed-id frame fails loudly") {
    val idx = IvfIndex.build(fixture, "vec_id", "embedding", nCells = 2,
      sampleSize = 64)
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("q_id", "qv")
    val bad = Seq((1L, "x")).toDF("c_id", "extra")
    intercept[IllegalArgumentException] {
      idx.topKFiltered(q, k = 5, nprobe = 2, bad)
    }
    idx.close()
  }
}
