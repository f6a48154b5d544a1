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
}
