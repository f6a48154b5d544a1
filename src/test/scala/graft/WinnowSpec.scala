package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Winnowing fingerprints: selection invariants, the winnowing sharing
  * guarantee, and short-document degeneration. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import spark.implicits._
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, w = 4)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  test("selected fingerprints are a subset of the k-gram hashes, bounded") {
    import spark.implicits._
    val doc = Seq((1L, "a b c d e f g h i j"))
    val grams = doc.toDF("doc_id", "text").select(
      transform(sequence(lit(1), size(split(col("text"), " ")) - 2),
        i => conv(substring(md5(concat_ws(" ",
          slice(split(lower(col("text")), " "), i, lit(3)))), 1, 15), 16, 10)
          .cast("long")).as("g"))
      .head().getSeq[Long](0).toSet
    val got = fps(doc)(1L)
    assert(got.subsetOf(grams), "fingerprints must be actual k-gram hashes")
    // 8 grams, window 4 -> at most 5 windows, at least 1 selection
    assert(got.nonEmpty && got.size <= 5)
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // w + k - 1 = 6 common tokens embedded in different contexts: the
    // shared run spans >= one full window of common k-grams, whose
    // minimum is selected in both docs
    val shared = "q w e r t y"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"alpha beta $shared gamma delta epsilon zeta"))
    val m = fps(docs)
    assert(m(1L).intersect(m(2L)).nonEmpty,
      s"no shared fingerprint despite a ${6}-token shared run: $m")
  }

  test("documents shorter than one window degenerate to the global minimum") {
    // 4 tokens -> 2 grams < w=4 -> exactly one fingerprint
    val m = fps(Seq((1L, "a b c d")))
    assert(m(1L).size === 1)
    // under k tokens -> no rows at all
    assert(fps(Seq((2L, "a b"))).get(2L).isEmpty)
  }

  test("native kernel == the composable md5-prefix HOF formulation") {
    // the slow reference: conv(substring(md5(gram),1,15),16,10) grams,
    // per-window array_min, array_distinct — the definition the DuckDB
    // oracle implements; the native WinnowSelect must match it row-set
    // for row-set on real fixture text (unicode, repeats, short docs)
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(200)
    val t = split(lower(col("text")), " ")
    val grams = transform(sequence(lit(1), size(t) - 2),
      i => conv(substring(md5(concat_ws(" ", slice(t, i, lit(3)))), 1, 15), 16, 10)
        .cast("long"))
    val g = col("__grams")
    val hofFps = when(size(g) >= 4,
        array_distinct(transform(sequence(lit(1), size(g) - 3),
          j => array_min(slice(g, j, lit(4))))))
      .otherwise(array(array_min(g)))
    val reference = docs.filter(size(t) >= 3)
      .select(col("doc_id"), grams.as("__grams"))
      .select(col("doc_id"), explode(hofFps).as("fp")).distinct()
    val native = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    assert(native.except(reference).count() === 0L)
    assert(reference.except(native).count() === 0L)
  }

  test("kernel is total: fewer tokens than k yields the empty set, not a crash") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val two = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b")))
    assert(graft.functions.WinnowKernels.select(two, 3, 4).numElements() === 0)
    val empty = new GenericArrayData(Array.empty[Any])
    assert(graft.functions.WinnowKernels.select(empty, 3, 4).numElements() === 0)
  }

  test("pairs: identical docs share all fingerprints, unrelated docs none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "entirely different words with nothing in common here at all"))
    val pairs = Dedup.winnowPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
