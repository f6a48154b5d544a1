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

  test("PRF expansion is df-capped and surfaces docs the seed cannot reach") {
    import org.apache.spark.sql.functions.{col, desc}
    // docs 1-3: seed term 'alpha' co-occurs with 'omega'; doc 4 has
    // 'omega' but NO seed term (the PRF win); 'the' is boilerplate in
    // every doc with the HIGHEST feedback mass (6 > omega's 3) — only
    // the df cap keeps it out of the expansion
    val docs = Seq(
      (1L, "alpha omega the the x"),
      (2L, "alpha omega the the y"),
      (3L, "alpha omega the the z"),
      (4L, "omega the the w"),
      (5L, "noise the the n"),
      (6L, "noise the the m")).toDF("doc_id", "text")
    val idx = graft.operators.InvertedIndex.build(docs, "doc_id", "text")
    // uncapped: the boilerplate term wins on raw mass
    val uncapped = Retrieval.prfExpandedQuery(idx, docs, "doc_id", "text",
      Seq("alpha"), nFeedback = 3, nExpand = 1)
    assert(uncapped == Seq("alpha", "the"))
    // df cap 2/3 (df*3 <= nDocs*2): 'the' (df 6 of 6) is excluded,
    // 'omega' (df 4 of 6) survives and wins on feedback mass
    val expanded = Retrieval.prfExpandedQuery(idx, docs, "doc_id", "text",
      Seq("alpha"), nFeedback = 3, nExpand = 1, maxDfFrac = Some((2, 3)))
    assert(expanded == Seq("alpha", "omega"))
    def served(terms: Seq[String]): Set[Long] =
      idx.serve(terms).orderBy(desc("bm25"), col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    // the seed query cannot reach doc 4; the expanded one surfaces it
    assert(!served(Seq("alpha")).contains(4L))
    assert(served(expanded).contains(4L))
    assert(served(expanded) == Set(1L, 2L, 3L, 4L))
  }

  test("fuzzy correction: df and term tie-breaks, passthrough, self-hit") {
    // vocab: cat df 5; car/cap/can df 2 each
    val docs = Seq(
      (1L, "cat car cap can"), (2L, "cat car cap can"),
      (3L, "cat"), (4L, "cat"), (5L, "cat")).toDF("doc_id", "text")
    val idx = graft.operators.InvertedIndex.build(docs, "doc_id", "text")
    val rep = Retrieval.correctionReport(
        idx, Seq("CAT", "caw", "canp", "xyzzy"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3))))
    assert(rep.toSeq == Seq(
      // canp is 1 edit from BOTH can and cap (equal df 2): term asc wins
      ("canp", "can", Some(1), Some(2L)),
      // an in-vocab term is its own distance-0 argmin (lowercased input)
      ("cat", "cat", Some(0), Some(5L)),
      // caw is 1 edit from all four: df desc picks cat (5 > 2)
      ("caw", "cat", Some(1), Some(5L)),
      // nothing within 2 edits: passthrough with NULL dist/df
      ("xyzzy", "xyzzy", None, None)))
    // maxDist=0 turns the typo into a passthrough
    val strict = Retrieval.correctionReport(idx, Seq("caw"), maxDist = 0)
      .collect().map(r => (r.getString(1), Option(r.get(2))))
    assert(strict.toSeq == Seq(("caw", None)))
    // correctTerms dedups collisions: both inputs correct to one 'cat'
    assert(Retrieval.correctTerms(idx, Seq("caw", "cat")) == Seq("cat"))
  }

  test("MMR trades relevance against redundancy, hand-computed") {
    // a=(1,0) rel .95, b=(1,0) rel .90 (a clone of a), c=(0,1) rel .50
    val short = Seq(
      (1L, 0.95, Array(1.0f, 0.0f)),
      (2L, 0.90, Array(1.0f, 0.0f)),
      (3L, 0.50, Array(0.0f, 1.0f))).toDF("doc_id", "rel", "embedding")
    // pick 1: a (.7*.95 = .665). pick 2: b scores .7*.90 - .3*sim(b,a=1.0)
    // = .33; c scores .7*.50 - .3*0 = .35 -> the DIVERSE c wins despite
    // lower relevance
    val out = Retrieval.mmrRerank(short, "doc_id", "rel", "embedding",
      k = 2, lambdaRel = 0.7, lambdaDiv = 0.3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((1, 1L, 0.665), (2, 3L, 0.35)))
    // with the diversity weight off, pure relevance order returns
    val rel = Retrieval.mmrRerank(short, "doc_id", "rel", "embedding",
      k = 2, lambdaRel = 0.7, lambdaDiv = 0.0).collect().map(_.getLong(1))
    assert(rel.toSeq == Seq(1L, 2L))
    // equal scores break by id; k beyond the shortlist picks everything
    val tied = Retrieval.mmrRerank(
      Seq((9L, 0.8, Array(1.0f, 0.0f)), (4L, 0.8, Array(0.0f, 1.0f)))
        .toDF("doc_id", "rel", "embedding"),
      "doc_id", "rel", "embedding", k = 5, lambdaRel = 0.7, lambdaDiv = 0.3)
      .collect().map(_.getLong(1))
    assert(tied.toSeq == Seq(4L, 9L))
  }

  test("best-window snippet: distinct hits, leftmost tie, short doc") {
    val docs = Seq(
      // the window holding both 'cat' and 'dog' (distinct hits 2) beats
      // the earlier cat-cat window (distinct hits 1)
      (1L, "cat cat x x x x x x x cat dog x"),
      // two equal-hit windows: the LEFTMOST start wins
      (2L, "cat x x x cat x x x"),
      // shorter than the window: the whole doc is the only window
      (3L, "dog cat")).toDF("doc_id", "text")
    val out = Retrieval.bestWindow(docs, "doc_id", "text",
        Seq("cat", "dog"), windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).sortBy(_._1)
    // starts 7, 8, 9 all hold {cat, dog}: leftmost (7) wins
    assert(out(0)._2 == 7 && out(0)._3 == 2 && out(0)._4 == "x x cat dog")
    assert(out(1)._2 == 0 && out(1)._3 == 1 && out(1)._4 == "cat x x x")
    assert(out(2)._2 == 0 && out(2)._3 == 2 && out(2)._4 == "dog cat")
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
