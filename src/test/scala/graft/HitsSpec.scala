package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hits

/** Fixed-point HITS: hand-computed bipartite rounds with exact integer
  * max-normalization, role zeros, and duplicate-edge collapse. */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  // a -> {x, y}, b -> {x}: hubs are a, b; authorities x, y
  private def edges = Seq(("a", "x"), ("a", "y"), ("b", "x"))
    .toDF("src", "dst")

  test("hand-computed bipartite round 1") {
    // h0 = 1e9 each. a1raw: x = 2e9, y = 1e9, max = 2e9 ->
    // a1(x) = 1e9, a1(y) = 5e8. h1raw: a = 1.5e9, b = 1e9, max = 1.5e9
    // -> h1(a) = 1e9, h1(b) = 1e18 DIV 1.5e9 = 666666666.
    val r1 = scores(Hits.run(edges, "src", "dst", iterations = 1))
    assert(r1 == Map(
      "a" -> ((1000000000L, 0L)), "b" -> ((666666666L, 0L)),
      "x" -> ((0L, 1000000000L)), "y" -> ((0L, 500000000L))))
  }

  test("hand-computed bipartite round 2 (normalization literals replayed)") {
    // a2raw: x = h1(a)+h1(b) = 1666666666, y = h1(a) = 1e9, max = x ->
    // a2(x) = 1e9, a2(y) = 1e18 DIV 1666666666 = 600000000.
    // h2raw: a = 1.6e9, b = 1e9, max = 1.6e9 -> h2(a) = 1e9,
    // h2(b) = 1e18 DIV 1.6e9 = 625000000.
    val r2 = scores(Hits.run(edges, "src", "dst", iterations = 2))
    assert(r2 == Map(
      "a" -> ((1000000000L, 0L)), "b" -> ((625000000L, 0L)),
      "x" -> ((0L, 1000000000L)), "y" -> ((0L, 600000000L))))
  }

  test("tolScaled convergence stop halts before the round cap") {
    // a perfect matching a->x, b->y is at its fixed point after round 1
    // (both raws equal the max, so every score normalizes to scale);
    // round 2's maxDelta is 0 < tol on both tables — the loop must stop
    // there, and a generous cap changes nothing
    val matching = Seq(("a", "x"), ("b", "y")).toDF("src", "dst")
    val r = scores(Hits.run(matching, "src", "dst", iterations = 50,
      tolScaled = Some(1000L)))
    assert(r == Map(
      "a" -> ((1000000000L, 0L)), "b" -> ((1000000000L, 0L)),
      "x" -> ((0L, 1000000000L)), "y" -> ((0L, 1000000000L))))
  }

  test("duplicate edges collapse; a pure authority keeps hub 0") {
    val dup = Seq(("a", "x"), ("a", "x"), ("b", "x")).toDF("src", "dst")
    // after collapse x's in-sum is h(a)+h(b), never 2h(a)+h(b)
    val r = scores(Hits.run(dup, "src", "dst", iterations = 1))
    assert(r("x") == ((0L, 1000000000L)))
    assert(r("a") == ((1000000000L, 0L)) && r("b") == ((1000000000L, 0L)))
  }

  test("incremental append: scores over the appended graph equal a fresh " +
      "build of the union; re-append is a structural no-op") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val all = events.select(concat(lit("U"), col("user_id")).as("s"),
      col("event_type").as("d"))
    val day1 = all.filter(col("s") < "U5")
    val day2 = all.filter(col("s") >= "U5")
    val g1 = Hits.prepare(day1, "s", "d")
    val appended = Hits.append(g1, day2, "s", "d")
    val fresh = Hits.prepare(day1.unionByName(day2), "s", "d")
    val ra = scores(Hits.runOn(appended, iterations = 2))
    val rf = scores(Hits.runOn(fresh, iterations = 2))
    assert(ra === rf)
    assert(appended.eBySrc.count() === fresh.eBySrc.count(),
      "append must not duplicate or drop edges vs the union distinct")
    val again = Hits.append(appended, day2, "s", "d")
    assert(again.eBySrc.count() === appended.eBySrc.count())
    assert(scores(Hits.runOn(again, iterations = 2)) === ra)
  }
}
