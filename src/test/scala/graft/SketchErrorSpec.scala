package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Bounded-error assertions for the sketch aggregates feeding
  * `approx_sketches` (rows-only in the driver gate, so a sketch regression
  * would otherwise pass silently): HLL at rsd=0.02 must land within 2% of
  * the exact distinct count per group, and the approximate median must sit
  * within 1% of the exact median value. Deterministic for fixed input. */
class SketchErrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct(rsd=0.02) within 2% of exact per group") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.02, s"HLL error $err for group $flag (approx=$approx exact=$exact)")
    }
  }

  test("HLL observed error stays in a pinned tight envelope at every SF") {
    // The driver gate (approx_sketches_gate) allows 3 sigma = 6% — the
    // statistically honest bound for rsd=0.02 under data regeneration.
    // This test pins the OBSERVED error on the actual fixtures much
    // tighter (2.5%), so a silent drift from ~0% to 5% — inside the
    // driver gate — still fails the suite; the assert message records
    // the measured value for the next reader. Deterministic: Spark's
    // HLL is seedless-deterministic for fixed input.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val li = Tables.load(spark, s"/root/testdata/$sf", "lineitem")
      val both = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
          countDistinct(col("l_partkey")).as("exact"))
        .as[(String, Long, Long)].collect()
      assert(both.length == 3, s"$sf: expected 3 return-flag groups")
      both.foreach { case (flag, approx, exact) =>
        val err = math.abs(approx - exact).toDouble / exact
        info(f"$sf group=$flag exact=$exact approx=$approx err=${err * 100}%.3f%%")
        assert(err <= 0.025,
          f"$sf group=$flag: observed HLL error ${err * 100}%.3f%% " +
            f"(approx=$approx exact=$exact) left the pinned 2.5%% envelope")
      }
    }
  }

  test("percentile_approx(0.5, 1000) within 1% of the exact median") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .as[(String, Double, Double)].collect()
    both.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact) / exact
      assert(err <= 0.01, s"median error $err for group $flag (approx=$approx exact=$exact)")
    }
  }

  test("approx_sketches_gate booleans pin to TRUE (driver-gate contract)") {
    val rows = graft.queries.SqlSurfaceQueries.queries("approx_sketches_gate")(
      spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"sketch out of bound for group ${r.getString(0)}: $r")
    }
  }

  test("space_saving captures every item above n/k with error <= n/k") {
    import graft.functions.SpaceSaving.space_saving
    import spark.implicits._
    // Zipf-ish synthetic stream: item i appears ~N/(i+1) times
    val rows = (0 until 60).flatMap(i => Seq.fill(3000 / (i + 1))(s"term_$i"))
    val df = rows.toDF("term").repartition(13) // multi-partition merge path
    val k = 24
    val got = df.agg(space_saving(col("term"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.max_err"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val bound = n / k
    // guarantee 1: every item with true frequency > n/k is tracked
    exact.filter(_._2 > bound).keys.foreach { item =>
      assert(got.contains(item), s"$item (freq ${exact(item)} > $bound) missing")
    }
    // guarantee 2: estimates never undercount and overcount by <= max_err <= n/k
    got.foreach { case (item, (est, err)) =>
      val t = exact(item)
      assert(est >= t, s"$item undercounted: $est < $t")
      assert(est - t <= err, s"$item overcount ${est - t} exceeds declared err $err")
      assert(err <= bound, s"$item declared err $err exceeds n/k = $bound")
    }
    // determinism across identical runs (same partitioning)
    val again = df.agg(space_saving(col("term"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.max_err"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
  }

  test("count-min sketch never undercounts and stays within eps*N on a skewed stream") {
    import spark.implicits._
    // zipf-ish synthetic stream: item i appears ~3000/i times over a
    // 200-item universe — heavy head, long tail, guaranteed collisions
    // at a deliberately COARSE eps (width ~20 cells for 200 items)
    val rows = (1 to 200).flatMap(i => Seq.fill(3000 / i)(s"item_$i"))
    val df = rows.toDF("term")
    val n = rows.size.toLong
    val eps = 0.1
    val skBytes = df
      .agg(count_min_sketch(col("term"), lit(eps), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = rows.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val slack = math.ceil(eps * n).toLong
    exact.foreach { case (t, ex) =>
      val est = cms.estimateCount(t)
      assert(est >= ex, s"$t undercounted: $est < $ex")
      assert(est <= ex + slack, s"$t overcount ${est - ex} exceeds eps*N = $slack")
    }
    // coarse width must actually collide somewhere, or the bound check
    // proved nothing
    assert(exact.exists { case (t, ex) => cms.estimateCount(t) > ex },
      "no collisions at width ~2/eps over 200 items — fixture degenerate")
  }
}
