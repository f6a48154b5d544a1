package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cheap smoke over the whole driver surface at sf0.001: every registered
  * query runs and returns rows; every oracle key refers to a real query.
  * (Value-level correctness is the driver's DuckDB gate + tools/compare.py.) */
class QueriesSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  /** Threshold-filtered pair queries may legitimately be empty at sf0.001;
    * the driver's t2 hash gate compares empty-vs-empty fine. */
  private val mayBeEmpty = Set("dedup_embedding_cosine", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_semantic")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val n = fn(spark, TestSpark.sfDir).count()
      if (!mayBeEmpty.contains(name)) assert(n > 0)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
