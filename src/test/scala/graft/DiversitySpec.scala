package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Lexical diversity report: hand-computed TTR / Simpson / entropy on a
  * planted stratum, the quantized micro-nat order-free integer entropy
  * sum, and null-stratum exclusion. */
class DiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

  test("hand-computed TTR, Simpson, and entropy") {
    // stratum x: tokens a:2 b:2 c:1 over 2 docs -> N=5, types=3
    val docs = Seq((1L, "x", "a a b"), (2L, "x", "b c"),
      (3L, null.asInstanceOf[String], "ignored row"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.diversityReport(docs, "lang", "text").collect()
    assert(out.length == 1, "null stratum must be excluded")
    val r = out.head
    assert(r.getString(0) == "x")
    assert(r.getLong(1) == 2L)  // n_docs
    assert(r.getLong(2) == 5L)  // n_tokens
    assert(r.getLong(3) == 3L)  // n_types
    assert(r.getDouble(4) == 0.6)  // 3/5
    assert(r.getDouble(5) == 0.2)  // (2+2+0)/(5*4)
    // quantized micro-nat entropy: q(c) = round(ln(c)*1e6) per count
    // class, exact integer mass sum — H = (q(5)*5 - (2q(2)+2q(2)+1q(1)))
    // / (5*1e6)
    def q(c: Long): Long = math.round(math.log(c.toDouble) * 1e6)
    val sMicro = 2 * q(2) + 2 * q(2) + 1 * q(1)
    assert(r.getDouble(6) == round6((q(5) * 5 - sMicro) / 5e6))
  }

  test("a single-token stratum reports zero Simpson, zero entropy") {
    val docs = Seq((1L, "y", "solo")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.diversityReport(docs, "lang", "text").collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 1.0)  // TTR of a single type
    assert(r.getDouble(5) == 0.0)  // guarded 0/0
    assert(r.getDouble(6) == 0.0)  // ln(1) - 0/1
  }
}
