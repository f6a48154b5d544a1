package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Reciprocal-rank fusion: hand-computed RRF arithmetic, the
  * absent-from-one-list convention (0 contribution, NULL rank kept),
  * deterministic id tie-breaks, and topN truncation. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

  test("hand-computed fusion: overlap, single-signal docs, id tie-break") {
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "lex_rank")
    val dense = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("doc_id", "dense_rank")
    val out = Retrieval.rrfFuse(lex, dense, "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getDouble(4)))
    def rrf(ranks: Int*) = round6(ranks.map(r => 1.0 / (60 + r)).sum)
    // doc 2: 1/62 + 1/61 (highest); doc 3: 1/63 + 1/62;
    // docs 1 and 4: 1/61 and 1/63 single-signal; 2-vs-3 and the rest
    // ordered by score, no ties here
    assert(out.toSeq == Seq(
      (1, 2L, Some(2), Some(1), rrf(2, 1)),
      (2, 3L, Some(3), Some(2), rrf(3, 2)),
      (3, 1L, Some(1), None, rrf(1)),
      (4, 4L, None, Some(3), rrf(3))))
    // equal scores break by id: two docs each only-rank-1 in one list
    val tied = Retrieval.rrfFuse(
      Seq((9L, 1)).toDF("doc_id", "lex_rank"),
      Seq((5L, 1)).toDF("doc_id", "dense_rank"), "doc_id").collect()
    assert(tied.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 5L), (2, 9L)))
  }

  test("topN truncates after fusion, not per list") {
    val lex = (1L to 8L).map(i => (i, i.toInt)).toDF("doc_id", "lex_rank")
    val dense = (5L to 12L).map(i => (i, (i - 4).toInt)).toDF("doc_id", "dense_rank")
    val out = Retrieval.rrfFuse(lex, dense, "doc_id", topN = 3).collect()
    assert(out.length == 3)
    // docs 5..8 appear in BOTH lists and outscore any single-signal doc;
    // among them lower combined ranks win
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 6L, 7L))
  }
}
