package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Fixed-point PageRank: hand-computed star-graph iterations, truncating
  * division, zero-iteration init, and duplicate-edge collapse. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hand-computed star graph: two damped rounds") {
    // undirected star centered on a (each edge sent both ways):
    // deg(a) = 2, deg(b) = deg(c) = 1
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    // r0 = 1e9 each. Round 1: S(a) = 1e9 + 1e9; S(b) = S(c) = 1e9 DIV 2.
    // r1(a) = 1.5e8 + (2e9*85) DIV 100 = 1.85e9; r1(b) = r1(c) =
    // 1.5e8 + (5e8*85) DIV 100 = 5.75e8.
    val r1 = ranks(PageRank.run(edges, "src", "dst", iterations = 1))
    assert(r1 == Map("a" -> 1850000000L, "b" -> 575000000L,
      "c" -> 575000000L))
    // Round 2: S(a) = 5.75e8 + 5.75e8; S(b) = S(c) = 1.85e9 DIV 2.
    // r2(a) = 1.5e8 + (1.15e9*85) DIV 100 = 1.1275e9;
    // r2(b) = 1.5e8 + (9.25e8*85) DIV 100 = 9.3625e8.
    val r2 = ranks(PageRank.run(edges, "src", "dst", iterations = 2))
    assert(r2 == Map("a" -> 1127500000L, "b" -> 936250000L,
      "c" -> 936250000L))
  }

  test("contributions truncate (DIV, not rounded division)") {
    // a fans out to 3 nodes: each gets 1e9 DIV 3 = 333333333 (truncating
    // DIV). c and d are dangling, so their r0 mass (2e9) redistributes:
    // share = 2e9 DIV 4 = 5e8 per node, and the damped sum truncates
    // again: ((333333333 + 5e8)*85) DIV 100 = 708333333.
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "a"))
      .toDF("src", "dst")
    val r1 = ranks(PageRank.run(edges, "src", "dst", iterations = 1))
    assert(r1("b") == 150000000L + 708333333L)
    assert(r1("c") == r1("b") && r1("d") == r1("b"))
  }

  test("personalized: teleport only on seeds, unreachable stays exactly 0") {
    // star a-b, a-c plus a disconnected pair d-e; seed = {a}
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"),
      ("d", "e"), ("e", "d")).toDF("src", "dst")
    // r0: a=1e9, rest 0. Round 1: S(b)=S(c)=1e9 DIV 2; S(a)=0.
    // r1(a)=1.5e8 (teleport only); r1(b)=r1(c)=(5e8*85) DIV 100=4.25e8;
    // d,e untouched = 0.
    val r1 = ranks(PageRank.personalized(edges, "src", "dst",
      seeds = Seq("a"), iterations = 1))
    assert(r1 == Map("a" -> 150000000L, "b" -> 425000000L,
      "c" -> 425000000L, "d" -> 0L, "e" -> 0L))
    // Round 2: S(a)=4.25e8+4.25e8=8.5e8; S(b)=S(c)=1.5e8 DIV 2=7.5e7.
    // r2(a)=1.5e8+(8.5e8*85) DIV 100=8.725e8; r2(b)=(7.5e7*85) DIV 100.
    val r2 = ranks(PageRank.personalized(edges, "src", "dst",
      seeds = Seq("a"), iterations = 2))
    assert(r2 == Map("a" -> 872500000L, "b" -> 63750000L,
      "c" -> 63750000L, "d" -> 0L, "e" -> 0L))
  }

  test("hand-computed dangling node: mass redistributes uniformly") {
    // a -> b, b -> c, c dangling: |V| = 3.
    // r0 = 1e9 each; dangling sum = r0(c) = 1e9, share = 1e9 DIV 3 =
    // 333333333.
    // S(a) = 0, S(b) = 1e9, S(c) = 1e9.
    // r1(a) = 1.5e8 + (333333333*85) DIV 100 = 1.5e8 + 283333333
    // r1(b) = r1(c) = 1.5e8 + ((1e9 + 333333333)*85) DIV 100
    //       = 1.5e8 + 1133333333
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r1 = ranks(PageRank.run(edges, "src", "dst", iterations = 1))
    assert(r1 == Map("a" -> (150000000L + 283333333L),
      "b" -> (150000000L + 1133333333L),
      "c" -> (150000000L + 1133333333L)))
    // total mass stays ~|V|*scale (vs. the deflationary drop-the-mass
    // formulation, which would lose the whole damped dangling share)
    val total = r1.values.sum
    assert(total > 2900000000L && total <= 3000000000L,
      s"mass must be conserved up to truncation, got $total")
    // Round 2: dangling sum = r1(c) = 1283333333, share DIV 3 = 427777777.
    // S(a) = 0, S(b) = r1(a) = 433333333, S(c) = r1(b) = 1283333333.
    // r2(a) = 1.5e8 + (427777777*85) DIV 100
    // r2(b) = 1.5e8 + ((433333333+427777777)*85) DIV 100
    // r2(c) = 1.5e8 + ((1283333333+427777777)*85) DIV 100
    val r2 = ranks(PageRank.run(edges, "src", "dst", iterations = 2))
    assert(r2 == Map(
      "a" -> (150000000L + (427777777L * 85L) / 100L),
      "b" -> (150000000L + ((433333333L + 427777777L) * 85L) / 100L),
      "c" -> (150000000L + ((1283333333L + 427777777L) * 85L) / 100L)))
  }

  test("tolScaled convergence stop halts before the round cap") {
    // symmetric pair a<->b is ALREADY at its fixed point (every round
    // maps 1e9 -> 1.5e8 + 8.5e8 = 1e9), so maxDelta = 0 < tol after one
    // round — the loop must stop there, and a generous cap changes nothing
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = ranks(PageRank.run(edges, "src", "dst", iterations = 50,
      tolScaled = Some(1000L)))
    assert(r == Map("a" -> 1000000000L, "b" -> 1000000000L))
  }

  test("overflow bound is enforced") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    // scale chosen so |V|=2 already violates 2 <= MaxValue/scale/dampNum
    val e = intercept[IllegalArgumentException] {
      PageRank.run(edges, "src", "dst", iterations = 1,
        scale = Long.MaxValue / 100)
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("zero iterations returns the uniform init; duplicate edges collapse") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    val r0 = ranks(PageRank.run(edges, "src", "dst", iterations = 0))
    assert(r0 == Map("a" -> 1000000000L, "b" -> 1000000000L))
    // the duplicate a->b edge is collapsed: deg(a) = 1, so b receives the
    // full rank once, not twice
    val r1 = ranks(PageRank.run(edges, "src", "dst", iterations = 1))
    assert(r1("b") == 150000000L + 850000000L)
  }

  test("incremental append: ranks over the appended graph equal a fresh " +
      "build of the union (artifact reuse under growth)") {
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    // a real fixture graph: user -> event_type edges, "day 1" = the first
    // half of users, the appended batch = the rest (degrees of EXISTING
    // event_type sources change too once symmetrized)
    import org.apache.spark.sql.functions._
    val all = events.select(concat(lit("U"), col("user_id")).as("s"),
      col("event_type").as("d"))
    def sym(df: org.apache.spark.sql.DataFrame) =
      df.union(df.select(col("d").as("s"), col("s").as("d")))
    val day1 = sym(all.filter(col("s") < "U5"))
    val day2 = sym(all.filter(col("s") >= "U5"))
    val g1 = PageRank.prepare(day1, "s", "d")
    val appended = PageRank.append(g1, day2, "s", "d")
    val fresh = PageRank.prepare(day1.unionByName(day2), "s", "d")
    // integer fixed point, no accumulated state: the appended artifacts
    // must rank EXACTLY like a fresh build of the union — and the
    // overlapping re-delivery inside day2's symmetrized half must not
    // double any edge (the anti-join dedup)
    val ra = ranks(PageRank.runOn(appended, iterations = 3, danglingFree = true))
    val rf = ranks(PageRank.runOn(fresh, iterations = 3, danglingFree = true))
    assert(ra === rf)
    assert(appended.e.count() === fresh.e.count(),
      "append must not duplicate or drop edges vs the union distinct")
    // a verbatim re-append of the same batch is a structural no-op
    val again = PageRank.append(appended, day2, "s", "d")
    assert(again.e.count() === appended.e.count())
    assert(ranks(PageRank.runOn(again, iterations = 3,
      danglingFree = true)) === ra)
  }
}
