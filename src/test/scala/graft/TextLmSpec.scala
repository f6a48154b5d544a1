package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Invariants of the corpus-trained bigram-LM quality signal that the
  * DuckDB oracle (which recomputes the same math) cannot witness. */
class TextLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val lm =
    TextQueries.queries("lm_bigram_quality")(spark, TestSpark.sfDir)

  test("scores are probabilities and rates stay in range") {
    val bad = lm.filter(
      col("pred_prob") <= 0.0 || col("pred_prob") > 1.0 ||
        col("novel_rate") < 0.0 || col("novel_rate") > 1.0 ||
        col("n_bigrams") <= 0L).count()
    assert(bad === 0L)
  }

  test("n_bigrams == n_tokens - 1 for every scored doc") {
    val toks = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        (size(split(lower(col("text")), " ")) - 1).cast("long").as("expect"))
    val mismatch = lm.join(toks, "doc_id")
      .filter(col("n_bigrams") =!= col("expect")).count()
    assert(mismatch === 0L)
    // and every >=2-token doc is scored (none silently dropped)
    assert(lm.count() === toks.filter(col("expect") >= 1L).count())
  }

  test("hand-computed scores on a synthetic corpus, dup doc novel_rate 0") {
    // corpus: V = {a,b,c}; bigram counts "a b"=4(df3), "b a"=1(df1),
    // "b c"=2(df2); contexts a=4, b=3; smoothed probs 5/7, 1/3, 1/2
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bigramLm(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got.toSeq === Seq(
      // doc1: (2*(5/7) + 1/3)/3 = 37/63; novel: {"a b","b a"} -> 1/2
      (1L, 3L, r6(37.0 / 63.0), 0.5),
      // doc2/doc3 (duplicates): (5/7 + 1/2)/2 = 17/28; all bigrams shared
      (2L, 2L, r6(17.0 / 28.0), 0.0),
      (3L, 2L, r6(17.0 / 28.0), 0.0)))
  }

  test("single-token and empty docs are dropped, not scored") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val ids = graft.operators.TextAnalysis.bigramLm(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }
}
